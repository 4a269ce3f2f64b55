package graft.queries

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Per-key running count through Spark 4's NEWEST arbitrary-state API
  * (`transformWithState` / StatefulProcessor — the successor of the
  * `flatMapGroupsWithState` the stream_user_state gate uses), over the
  * deterministic rate-micro-batch source. transformWithState requires
  * the RocksDB state store, so this also exercises the
  * `stream.stateStore=rocksdb` deployment backend on the newest API.
  * The source is deterministic (batch k = values 100k..100k+99, keys =
  * value mod 10), so the final running counts are asserted exactly. */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transformWithState: per-key running counts, exact") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import ss.implicits._
    val src = ss.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "100").option("numPartitions", "2")
      .option("startTimestamp", "0").option("advanceMillisPerBatch", "1000")
      .load().select(F.col("value")).as[Long]
    val out = src.groupByKey(_ % 10)
      .transformWithState(new CountingProcessor, TimeMode.None(),
        OutputMode.Update())
    val q = out.toDF("k", "n").writeStream.format("memory").queryName("tws")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // the source is unbounded — run until ≥5 committed batches, then
      // stop (processAllAvailable would never return here)
      val deadline = System.currentTimeMillis() + 60000
      while (q.recentProgress.length < 5 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(q.recentProgress.length >= 5, "stream did not advance")
    } finally q.stop()
    // each batch contributes exactly 10 rows per key (100 rows, keys =
    // value mod 10) and a batch commits all 10 key updates atomically,
    // so after stop every key's max running count is the SAME 10·B for
    // the number of fully-committed batches B
    val finals = ss.sql("SELECT k, max(n) FROM tws GROUP BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finals.keySet == (0L to 9L).toSet, s"keys: ${finals.keySet}")
    assert(finals.values.toSet.size == 1,
      s"keys disagree on batch count: $finals")
    val total = finals.values.head
    assert(total >= 50 && total % 10 == 0,
      s"running count $total not a full-batch multiple >= 50")
  }
}

/** ValueState-backed counter: state survives across micro-batches,
  * emitting the running total per key on every batch (Update mode). */
class CountingProcessor extends StatefulProcessor[Long, Long, (Long, Long)] {
  @transient private var count: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("c", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}
