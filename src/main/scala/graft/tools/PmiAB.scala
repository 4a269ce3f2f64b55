package graft.tools
import org.apache.spark.sql.SparkSession

/** Warm A/B for txt_pmi_top (flagged suspect twice in r13 runs at
  * ~2.6x its r6-era baseline entry): 3 same-JVM runs with memo
  * rollback — separates the short-query single-thread floor from a
  * code regression. */
object PmiAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("txt_pmi_top")(spark, dir).count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.queries.PackResources.releaseAll()
    }
    spark.stop()
  }
}
