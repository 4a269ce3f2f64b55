package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Restart / exactly-once: stop the hourly-aggregation drain mid-replay,
  * restart from the same checkpoint, and prove each finalized window
  * lands in the file sink exactly once — the claim a 100 TB/day
  * pipeline actually relies on. The mechanism under test is the
  * checkpoint's commit log (an interrupted micro-batch replays on
  * restart) plus the parquet sink's _spark_metadata manifest (files
  * from uncommitted batches are invisible to readers), A/B'd under
  * both state-store providers. */
class StreamRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def restartRun(provider: String): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if (provider == "rocksdb")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory(s"graft_restart_${provider}_")
    val sink = base.resolve("data").toString
    val plan = StreamingQueries.hourlyPlan(ss, dir)
    def start(trigger: Trigger) = plan.writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append").trigger(trigger).start()

    // phase 1: slow trigger (one staged file per ~500ms micro-batch),
    // stopped after >=2 committed batches — a mid-replay kill with the
    // in-flight batch's work (state updates, sink files) uncommitted
    val q1 = start(Trigger.ProcessingTime("500 milliseconds"))
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 && q1.isActive &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(q1.recentProgress.nonEmpty, "phase 1 never advanced")
    q1.stop()
    q1.awaitTermination()
    val phase1Rows = spark.read.schema(plan.schema).parquet(sink).count()

    // phase 2: restart from the checkpoint; AvailableNow drains the
    // remaining files (including the watermark-flush sentinels)
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination()

    // the sink must hold each finalized window EXACTLY once — a lost
    // checkpoint would drop windows, a manifest-less sink would
    // double-write the batch that was in flight at the kill
    val got = spark.read.schema(plan.schema).parquet(sink)
    assert(got.count() > phase1Rows,
      "restart contributed nothing - phase 1 drained everything " +
        "(stop-early raced the replay; slow the trigger)")
    val dupKeys = got.groupBy("hour_epoch", "event_type")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(dupKeys == 0L, s"$dupKeys window rows written more than once")
    // and the union of the two phases is the exact batch answer
    val expect = graft.Tables.load(spark, dir, "events")
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_value_cents"))
      .selectExpr("cast(unix_timestamp(window.start) as bigint) as hour_epoch",
        "event_type", "n", "sum_value_cents")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "restarted sink differs from the batch answer")
  }

  test("mid-replay restart lands every window exactly once (memory provider)") {
    restartRun("memory")
  }

  test("mid-replay restart lands every window exactly once (rocksdb provider)") {
    restartRun("rocksdb")
  }
}
