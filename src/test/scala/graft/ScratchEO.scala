package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: warm-path timing of dl_evenodd / dl_evenodd_bound with
  * the shared context memo intact (Test scope, never shipped). */
object ScratchEO {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.sum
    spark.range(2000000).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(sum("v")).count()
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"EO $tag: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    // cold: first gate pays ctx build (Tables.load + loadProgram);
    // warm: the memoized context makes repeat queries driver-loop only
    t("evenodd cold")(SparkEntry.queries("dl_evenodd")(spark, sfDir).count())
    t("evenodd warm1")(SparkEntry.queries("dl_evenodd")(spark, sfDir).count())
    t("evenodd warm2")(SparkEntry.queries("dl_evenodd")(spark, sfDir).count())
    t("bound warm1")(SparkEntry.queries("dl_evenodd_bound")(spark, sfDir).count())
    t("bound warm2")(SparkEntry.queries("dl_evenodd_bound")(spark, sfDir).count())
    graft.queries.PackResources.releaseAll()
    spark.stop()
  }
}
