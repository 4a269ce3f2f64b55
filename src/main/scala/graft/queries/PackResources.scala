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
  private val bcTracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.broadcast.Broadcast[_]]()

  /** Track a loose checkpointed RDD (a fixpoint's FINAL state, still
    * backing the returned DataFrame's lineage) for release: the graph
    * fixpoints unpersist superseded rounds eagerly, but the last
    * round's blocks must outlive the result's consumption — releaseAll
    * drains them with everything else. */
  def trackRDD(r: org.apache.spark.rdd.RDD[_]): Unit = rddTracked.add(r)

  /** Track a driver-created broadcast (e.g. a bloom sketch handle) for
    * release: the broadcast must outlive every plan that references it,
    * so the release points are the pack-wide ones (releaseAll / the
    * bench's snapshot rollback), not per-query. */
  def trackBroadcast(b: org.apache.spark.broadcast.Broadcast[_]): Unit =
    bcTracked.add(b)

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

  private val scalarMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Any]()

  /** Memoized driver-side scalar (e.g. the corpus-safe aug-id shift —
    * one max() job per (session, dir) instead of one per gate). */
  def scalar[T](s: SparkSession, dir: String, tag: String)(build: => T): T =
    scalarMemo.getOrElseUpdate((s, dir, tag), build).asInstanceOf[T]

  /** Opaque view of what is currently pinned; see releaseNewSince. */
  final case class Snapshot(
      cks: Set[(SparkSession, String, String)],
      ctxs: Set[(SparkSession, String, String)],
      rdds: Set[org.apache.spark.rdd.RDD[_]],
      bcs: Set[org.apache.spark.broadcast.Broadcast[_]])

  def snapshot(): Snapshot = {
    val rs = scala.collection.mutable.Set.empty[org.apache.spark.rdd.RDD[_]]
    rddTracked.forEach(r => rs += r)
    val bs = scala.collection.mutable.Set.empty[org.apache.spark.broadcast.Broadcast[_]]
    bcTracked.forEach(b => bs += b)
    Snapshot(ckMemo.keySet.toSet, ctxMemo.keySet.toSet, rs.toSet, bs.toSet)
  }

  /** Release ONLY what was pinned after `snap` was taken. The bench's
    * stall-retry uses this to roll back the memos a single query
    * materialized during its first timed run, so the re-timing runs
    * against the SAME cache state (cold things stay cold, memos built
    * by EARLIER queries stay warm) — min(first, retry) is then a
    * comparison of like with like, never a warm-cache fabrication.
    * Blocking unpersist: the blocks must actually be gone before the
    * retry starts, or the rebuild would race the async drop. */
  def releaseNewSince(snap: Snapshot): Unit = {
    ckMemo.keys.filterNot(snap.cks).foreach { k =>
      ckMemo.remove(k).foreach { df =>
        org.apache.spark.sql.GraftColumnBridge.checkpointedRDD(df)
          .foreach(_.unpersist(blocking = true))
      }
    }
    ctxMemo.keys.filterNot(snap.ctxs).foreach { k =>
      ctxMemo.remove(k).foreach(_.close())
    }
    val stale = scala.collection.mutable.Set.empty[org.apache.spark.rdd.RDD[_]]
    rddTracked.forEach(r => if (!snap.rdds(r)) stale += r)
    stale.foreach { r => r.unpersist(blocking = true); rddTracked.remove(r) }
    val staleBc = scala.collection.mutable.Set.empty[org.apache.spark.broadcast.Broadcast[_]]
    bcTracked.forEach(b => if (!snap.bcs(b)) staleBc += b)
    staleBc.foreach { b => destroyQuietly(b); bcTracked.remove(b) }
  }

  /** One already-destroyed broadcast (double release, user code) must
    * not abort the release loop and leak the rest of the tracked state
    * — same guard the Evaluator's retirement loop carries. */
  private def destroyQuietly(b: org.apache.spark.broadcast.Broadcast[_]): Unit =
    try b.destroy() catch { case _: Exception => () }

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
    scalarMemo.clear()
    rddTracked.forEach(_.unpersist(blocking = false))
    rddTracked.clear()
    bcTracked.forEach(destroyQuietly)
    bcTracked.clear()
  }
}
