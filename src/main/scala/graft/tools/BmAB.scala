package graft.tools
import org.apache.spark.sql.SparkSession
object BmAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("txt_bm25_topk","txt_hybrid_rrf","txt_bm25_topk","txt_hybrid_rrf").foreach { n =>
      graft.queries.PackResources.releaseAll()
      println(f"AB $n ${t(n)}%.2f cold")
    }
    println(f"AB warm-pair ${t("txt_bm25_topk")}%.2f + ${t("txt_hybrid_rrf")}%.2f shared-memo")
    graft.SparkEntry.release(); spark.stop()
  }
}
