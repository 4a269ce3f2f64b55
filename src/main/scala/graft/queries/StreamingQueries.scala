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
    // key by the canonical path (hashCode collides; symlinked paths alias)
    val canon = src.toRealPath().getParent.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val stage = Paths.get("/tmp/graft_stream", canon, "events")
    val dst = stage.resolve("events.parquet")
    // refresh when the source was regenerated (size or mtime differs)
    val stale = Files.exists(dst) &&
      (Files.size(dst) != Files.size(src) ||
        Files.getLastModifiedTime(dst) != Files.getLastModifiedTime(src))
    if (stale) Files.delete(dst)
    if (!Files.exists(dst)) {
      Files.createDirectories(stage)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES,
          StandardCopyOption.REPLACE_EXISTING)
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
    }),

    // Stateful streaming dedup: dropDuplicates on the event key with a
    // watermark bounding state, then per-type counts — the
    // exactly-once ingestion primitive of a training-data pipeline.
    // Counts after exact dedup are arrival-order independent, so the
    // batch oracle checks the streaming result exactly.
    "stream_dedup_count" -> ((s, dir) => {
      val schema = Tables.load(s, dir, "events").schema
      val sink = "stream_dedup_sink"
      val q = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts_utc", "1 hour")
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
    }),

    // Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState:
    // running per-user event counts (state = Long per key), drained with
    // AvailableNow; update-mode emissions land in the memory sink with
    // the final count per user.
    "stream_user_state" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val schema = Tables.load(s, dir, "events").schema
      val sink = "stream_user_state_sink"
      val q = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        .select(col("user_id").as[Long], col("event_id").as[Long])
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (uid: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + events.size
            state.update(n)
            (uid, n)
        }
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // update mode may emit a row per micro-batch; keep the final count
      s.table(sink).groupBy("user_id").agg(max("n").as("n"))
    }),

    // Native session windows in Structured Streaming: gap-based
    // session_window aggregation with watermark-bounded state — the
    // engine merges/extends sessions as events arrive, the canonical
    // streaming sessionization operator at any scale. The batch oracle
    // is the lag/running-sum formulation (timestamps are microsecond-
    // grained, so the half-open boundary can't produce ties).
    "stream_sessions" -> ((s, dir) => {
      val schema = Tables.load(s, dir, "events").schema
      val sink = "stream_sessions_sink"
      val q = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts_utc", "1 hour")
        .groupBy(session_window(col("ts_utc"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).selectExpr(
        "user_id",
        "cast(unix_micros(session_window.start) as bigint) as session_start",
        "n_events")
    }),

    // Watermarked STREAM-STREAM interval join (click→purchase
    // attribution): both sides are event-time streams with 1-hour
    // watermarks, and the join condition bounds the click time inside
    // [purchase - 1h, purchase] — Spark keeps only the watermark-bounded
    // window of each side in the state store, so the join's state is
    // O(traffic in the interval), never O(history). Append-mode output
    // makes every emitted pair final. This is the canonical streaming
    // enrichment operator at 100 TB/day ingest: no batch snapshot, no
    // unbounded buffering.
    "stream_join" -> ((s, dir) => {
      val schema = Tables.load(s, dir, "events").schema
      val sink = "stream_join_sink"
      def side(t: String, idCol: String, tsCol: String, userCol: String) =
        s.readStream.schema(schema)
          .parquet(stageDir(dir))
          .filter(col("event_type") === t)
          .select(col("event_id").as(idCol), col("user_id").as(userCol),
            expr("timestamp_micros(ts div 1000)").as(tsCol))
          .withWatermark(tsCol, "1 hour")
      val purchases = side("purchase", "pid", "pts", "user_id")
      val clicks = side("click", "cid", "cts", "c_user")
      val q = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
            col("cts") <= col("pts"))
        .select(col("pid"), col("cid"), col("user_id"),
          (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap_us"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
    }),

    // Sessionization, relational formulation: lag window over
    // (user_id, event time) + running sum of >1h gap breaks — the same
    // shape its oracle uses. One shuffle on user_id; the window sort is
    // Spark's spillable ExternalSorter, so a skewed user (bot traffic)
    // spills instead of OOMing an executor — no per-group array
    // buffering anywhere in the plan.
    "evt_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
      Tables.load(s, dir, "events")
        .selectExpr("user_id", "ts div 1000 as tsu", "event_id")
        .withColumn("prev", lag("tsu", 1).over(w))
        .groupBy("user_id")
        .agg(
          (lit(1L) + sum(when(col("tsu") - col("prev") > 3600000000L, 1L)
            .otherwise(0L))).as("n_sessions"),
          count(lit(1)).as("n_events"))
    })
  )

  val oracles: Map[String, String] = Map(
    "stream_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2""",
    "stream_dedup_count" ->
      """SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n
         FROM events GROUP BY event_type""",
    "stream_user_state" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY user_id""",
    "stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
         s AS (SELECT user_id, tsu,
                 CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) > 3600000000
                      THEN 1 ELSE 0 END AS brk
               FROM e),
         g AS (SELECT user_id, tsu,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
                                ROWS UNBOUNDED PRECEDING) AS sid
               FROM s)
         SELECT user_id, CAST(min(tsu) AS BIGINT) AS session_start,
                CAST(count(*) AS BIGINT) AS n_events
         FROM g GROUP BY user_id, sid""",
    "stream_join" ->
      """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS ptsu
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT event_id AS cid, user_id, epoch_us(ts) AS ctsu
                    FROM events WHERE event_type = 'click')
         SELECT p.pid, c.cid, p.user_id, p.ptsu - c.ctsu AS gap_us
         FROM p JOIN c ON p.user_id = c.user_id
           AND c.ctsu BETWEEN p.ptsu - 3600000000 AND p.ptsu""",
    "evt_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
         s AS (SELECT user_id, tsu,
                 lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
               FROM e)
         SELECT user_id,
           CAST(1 + sum(CASE WHEN tsu - prev > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
         FROM s GROUP BY user_id"""
  )
}
