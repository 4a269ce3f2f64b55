package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of emb_knn_lsh at a given dir. */
object EmbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EMBPROF $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm
    graft.SparkEntry.queries("emb_knn")(spark, sfDir).count()
    t("knn_lsh_cold")(graft.SparkEntry.queries("emb_knn_lsh")(spark, sfDir).count())
    t("knn_lsh_warm")(graft.SparkEntry.queries("emb_knn_lsh")(spark, sfDir).count())
    val df = graft.SparkEntry.queries("emb_knn_lsh")(spark, sfDir)
    println(df.queryExecution.executedPlan.toString.take(4000))
    graft.SparkEntry.release()
    spark.stop()
  }
}
