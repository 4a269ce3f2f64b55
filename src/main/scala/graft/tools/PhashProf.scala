package graft.tools

import org.apache.spark.sql.SparkSession

/** Decompose mm_phash_pairs' sf1.0 wall: variant synthesis + dHash
  * pass vs band join vs verify. */
object PhashProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    t("pairs_cold")(graft.SparkEntry.queries("mm_phash_pairs")(spark, dir).count())
    t("pairs_warm_memo")(graft.SparkEntry.queries("mm_phash_pairs")(spark, dir).count())
    spark.stop()
  }
}
