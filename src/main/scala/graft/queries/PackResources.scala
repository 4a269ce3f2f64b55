package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime resources the query packs pin: memoized checkpointed
  * DataFrames (shingle sets, quantized vectors) and DatalogContexts whose
  * evaluators hold persisted fixpoint state. Memoization lets queries in
  * one pack share a materialization pass; `releaseAll()` drains every
  * pinned block when the pack run ends — the CachedRDDManager lifecycle
  * (reference CachedRDDManager.scala:26-107) at the pack level, so a
  * long-lived session running many packs returns the executor block
  * manager to baseline between runs. */
object PackResources {

  private val ckMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()
  private val ctxMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), graft.datalog.DatalogContext]()
  private val rddTracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.rdd.RDD[_]]()

  /** Track a loose checkpointed RDD (a fixpoint's FINAL state, still
    * backing the returned DataFrame's lineage) for release: the graph
    * fixpoints unpersist superseded rounds eagerly, but the last
    * round's blocks must outlive the result's consumption — releaseAll
    * drains them with everything else. */
  def trackRDD(r: org.apache.spark.rdd.RDD[_]): Unit = rddTracked.add(r)

  /** Memoized localCheckpoint: one materialization per (session, dir,
    * tag), tracked for release. */
  def checkpoint(s: SparkSession, dir: String, tag: String)
                (build: => DataFrame): DataFrame =
    ckMemo.getOrElseUpdate((s, dir, tag), build.localCheckpoint())

  /** Memoized DatalogContext (shared fixpoint across queries over the
    * same program), closed on release. */
  def context(s: SparkSession, dir: String, tag: String)
             (build: => graft.datalog.DatalogContext): graft.datalog.DatalogContext =
    ctxMemo.getOrElseUpdate((s, dir, tag), build)

  /** Unpersist every tracked checkpoint and close every tracked context.
    * DataFrames previously returned by pack queries must be fully
    * consumed first (checkpoint lineage is truncated — the blocks are
    * the data). */
  def releaseAll(): Unit = {
    ckMemo.values.foreach { df =>
      org.apache.spark.sql.GraftColumnBridge.checkpointedRDD(df)
        .foreach(_.unpersist(blocking = false))
    }
    ckMemo.clear()
    ctxMemo.values.foreach(_.close())
    ctxMemo.clear()
    rddTracked.forEach(_.unpersist(blocking = false))
    rddTracked.clear()
  }
}
