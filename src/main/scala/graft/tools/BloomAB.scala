package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates the bloom pre-filter's cost inside the TC fixpoint
  * (sf0.1): `none` = diffflip only; `feed` = accumulator feeds but the
  * probe never engages (auto with an unreachable minrows); `probe` =
  * forced-on, sketch consulted from iteration 0. Pack memos released
  * between passes so every pass runs its fixpoint cold.
  *
  * run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.BloomAB"
  */
object BloomAB {
  // same intra-block DAG the dl_* gates derive from customer keys
  private def arcDF(s: SparkSession, dir: String) = {
    import org.apache.spark.sql.functions._
    val B = 16
    val keys = graft.Tables.load(s, dir, "customer").select(col("c_custkey").as("k"))
    val mx = keys.agg(max("k").as("m"))
    val withMax = keys.crossJoin(broadcast(mx))
    val step = withMax
      .filter(col("k") % B =!= (B - 1) && col("k") + 1 <= col("m"))
      .select(col("k").as("x"), (col("k") + 1).as("y"), lit(2L).as("c"))
    val skip = withMax
      .filter(col("k") % B <= (B - 4) && col("k") + 3 <= col("m"))
      .select(col("k").as("x"), (col("k") + 3).as("y"), lit(5L).as("c"))
    step.union(skip)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("dl_reach")(spark, sfDir).count() // warmup
    graft.queries.PackResources.releaseAll()
    val modes: Seq[(String, Seq[(String, String)])] = Seq(
      "none" -> Seq(
        "spark.datalog.recursion.bloomprefilter" -> "false"),
      "feed" -> Seq(
        "spark.datalog.recursion.bloomprefilter" -> "auto",
        "spark.datalog.recursion.bloomprefilter.minrows" -> Long.MaxValue.toString),
      "probe" -> Seq(
        "spark.datalog.recursion.bloomprefilter" -> "true"))
    val base = Seq(
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.recursion.diffflip" -> "true")
    for (round <- 1 to 3; (label, confs) <- modes) {
      (base ++ confs).foreach { case (k, v) => spark.conf.set(k, v) }
      graft.queries.PackResources.releaseAll()
      val c = new graft.datalog.DatalogContext(spark)
      c.loadProgram(
        "database({arc(X:long, Y:long, C:long)}). " +
          "tcx(A,B) <- arc(A,B,_). tcx(A,B) <- tcx(A,C), arc(C,B,_).")
      c.registerTable("arc", arcDF(spark, sfDir))
      val t0 = System.nanoTime()
      val n = c.query("tcx(A,B).").count()
      val t = (System.nanoTime() - t0) / 1e9
      c.close()
      println(f"BLOOMAB round=$round mode=$label rows=$n t=$t%.2f")
      Seq("spark.datalog.recursion.bloomprefilter.minrows",
        "spark.datalog.recursion.bloomprefilter").foreach(spark.conf.unset)
    }
    graft.SparkEntry.release()
    spark.stop()
  }
}
