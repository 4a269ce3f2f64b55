package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm A/B of the looped vs within-task APSP gates (cold-JVM effects
  * cancel after round 1; pack memos released between runs). */
object ApspAB {
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
    for (round <- 1 to 3; q <- Seq("dl_apsp", "dl_apsp_localiter")) {
      graft.queries.PackResources.releaseAll()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"APSPAB round=$round q=$q rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    graft.SparkEntry.release()
    spark.stop()
  }
}
