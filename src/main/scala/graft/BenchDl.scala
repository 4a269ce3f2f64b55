package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B of the fixpoint dedup paths (copartition chain vs
  * legacy except) — run: sbt "runMain graft.BenchDl [sfDir]". */
object BenchDl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Seq("dl_tc", "dl_sg", "dl_tc_nl")
    // warmup
    SparkEntry.queries("dl_reach")(spark, sfDir).count()
    for (round <- 1 to 2; mode <- Seq("true", "false")) {
      spark.conf.set("spark.datalog.recursion.copartition.enabled", mode)
      val times = queries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        q -> (System.nanoTime() - t0) / 1e9
      }
      println(s"round $round copart=$mode: " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" ") +
        f" total=${times.map(_._2).sum}%.2f")
    }
    spark.stop()
  }
}
