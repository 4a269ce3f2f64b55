package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet directly — filters and column pruning are pushed to the scan by
  * Catalyst, so at 100 TB these reads only touch the columns/row-groups the
  * query needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Some fixture generations write events.ts as TIMESTAMP(NANOS), which
    // Spark 4 rejects by default; read that encoding as epoch-nanos BIGINT
    // (exact — no precision loss).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Contract for all consumers: `ts` is epoch-nanos BIGINT regardless of
    // how the fixture encoded it — the driver's parquet writer has shipped
    // nanos-as-long (r1-r7) and naive timestamp[us] (r8+) across
    // regenerations. The NTZ conversion is timezone-independent
    // (timestampdiff on wall-clock values), matching DuckDB's epoch_us()
    // on the same naive column.
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
      case Some(TimestampType) =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case _ => df
    }
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
