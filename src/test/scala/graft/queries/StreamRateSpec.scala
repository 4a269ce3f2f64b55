package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Non-file streaming ingestion: the pack's file-replay gates prove the
  * operators against the DuckDB oracle; this spec proves the SAME
  * watermark/append shapes run over a generator source (`rate-micro-
  * batch` — Spark's deterministic ingest source: batch k carries rows
  * k·R..k·R+R-1 at timestamp start + k·advance), standing in for the
  * kafka-style ingest a deployment would plug in. Counts and sums are
  * asserted EXACTLY because the source is deterministic. */
class StreamRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed aggregation over a rate-micro-batch source (exact results)") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val src = ss.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "100")
      .option("numPartitions", "2")
      .option("startTimestamp", "0")
      .option("advanceMillisPerBatch", "30000")
      .load() // (timestamp, value): batch k = values 100k..100k+99 at 30s·k
    val agg = src.withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 minute"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .selectExpr("cast(unix_timestamp(window.start) as long) as w", "n", "s")
    val q = agg.writeStream.format("memory").queryName("rate_win")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // run until at least 8 micro-batches committed (= 4 minutes of
      // event time; windows 0-2 are then closed and appended)
      val deadline = System.currentTimeMillis() + 60000
      while (q.recentProgress.length < 8 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(q.recentProgress.length >= 8, "stream did not advance")
    } finally q.stop()
    val rows = ss.sql("SELECT w, n, s FROM rate_win ORDER BY w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length >= 3, s"expected ≥3 closed windows, got ${rows.toSeq}")
    // window m holds batches 2m and 2m+1: n = 200 rows, sum = arithmetic
    // series over values 200m..200m+199
    for (((w, n, sum), m) <- rows.zipWithIndex) {
      assert(w == 60L * m, s"window $m start: $w")
      assert(n == 200L, s"window $m count: $n")
      val lo = 200L * m
      val want = (lo + (lo + 199)) * 200 / 2
      assert(sum == want, s"window $m sum: $sum != $want")
    }
  }
}
