package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B of `spark.datalog.*` (or any) conf values over the
  * dl_* gates. Pack state is released between runs so every
  * measurement re-runs its fixpoint under the conf being measured.
  *
  * run: sbt "runMain graft.BenchDl [sfDir] [confKey=v1|v2|...] [q1,q2,...]"
  * default: copartition true|false over dl_tc,dl_sg,dl_tc_nl
  */
object BenchDl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (confKey, confVals) = args.lift(1) match {
      case Some(kv) =>
        val Array(k, vs) = kv.split("=", 2)
        (k, vs.split('|').toSeq)
      case None =>
        ("spark.datalog.recursion.copartition.enabled", Seq("true", "false"))
    }
    val queries = args.lift(2)
      .map(_.split(',').toSeq)
      .getOrElse(Seq("dl_tc", "dl_sg", "dl_tc_nl"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (parquet first-touch + codegen)
    SparkEntry.queries("dl_reach")(spark, sfDir).count()
    SparkEntry.release()
    for (round <- 1 to 2; v <- confVals) {
      spark.conf.set(confKey, v)
      val times = queries.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        q -> (System.nanoTime() - t0) / 1e9
      }
      SparkEntry.release() // next conf value re-runs the fixpoints
      println(s"round $round $confKey=$v: " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" ") +
        f" total=${times.map(_._2).sum}%.2f")
    }
    spark.stop()
  }
}
