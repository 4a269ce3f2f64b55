package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for `spark.datalog.recursion.diffflip` on the fixpoint
  * gates (run at sf0.1: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * sbt "runMain graft.tools.DiffFlipAB"`). Alternates off/on twice so
  * JIT/page-cache warmup cancels out; releases pack memos between
  * passes so every pass evaluates its fixpoints cold. */
object DiffFlipAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("dl_tc", "dl_sg", "dl_reach", "dl_tc_bound", "dl_tc_nl")
    for (flip <- Seq("false", "auto", "true", "false", "auto", "true")) {
      spark.conf.set("spark.datalog.recursion.diffflip", flip)
      graft.queries.PackResources.releaseAll()
      val times = qs.map { q =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        q -> (System.nanoTime() - t0) / 1e9
      }
      println(s"AB flip=$flip " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" "))
    }
    graft.SparkEntry.release()
    spark.stop()
  }
}
