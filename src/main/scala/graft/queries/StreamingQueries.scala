package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables

/** Structured Streaming coverage: the events table replayed as a file
  * stream (`readStream` → event-time window aggregation → memory sink,
  * `Trigger.AvailableNow` to drain deterministically). The reference is
  * batch-only (SURVEY.md §2.6 "Streaming: none") — this is the additive
  * Spark-native streaming story.
  *
  * The aggregation is the streaming twin of q16_time_bucket, so the
  * batch SQL oracle checks the streaming result exactly: counts and
  * integer-cents sums per (event-hour, type) are arrival-order
  * independent. At scale this runs unchanged as a continuous job with
  * the watermark bounding state.
  */
object StreamingQueries extends QueryPack {

  /** The file-stream source tails a *directory*; the test data is a
    * single parquet file, so stage it (hardlink, else copy) under /tmp
    * once per scale factor. */
  private def stageDir(dir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(dir, "events.parquet")
    val stage = Paths.get("/tmp/graft_stream",
      Integer.toHexString(dir.hashCode), "events")
    val dst = stage.resolve("events.parquet")
    if (!Files.exists(dst)) {
      Files.createDirectories(stage)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    stage.toString
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly" -> ((s, dir) => {
      // batch read only to obtain the schema (required by readStream)
      val schema = Tables.load(s, dir, "events").schema
      val sink = "stream_hourly_sink"
      val q = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        // ts is epoch-nanos BIGINT (Tables.load legacy conf); micros
        // truncation matches the oracle's date_trunc exactly
        .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts_utc", "1 hour")
        .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_value_cents"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).selectExpr(
        "cast(unix_timestamp(window.start) as bigint) as hour_epoch",
        "event_type", "n", "sum_value_cents")
    })
  )

  val oracles: Map[String, String] = Map(
    "stream_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2"""
  )
}
