package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage decomposition of txt_span_dedup (Test scope). */
object ScratchSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions.nGramHashSeq
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SPAN $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val d = Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "lower(text) as t")
    val tokHashes = expr(
      "transform(split(t, ' '), x -> xxhash64(x))")
    val g = d.select(col("doc_id"), tokHashes.as("h"))
      .filter(size(col("h")) >= 13)
      .select(col("doc_id"), posexplode(nGramHashSeq(col("h"), 13)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "ng")
    val maxDf = 1000
    val rare = g.groupBy("ng").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("ng")
    val gg = g.join(rare, "ng")
    gg.persist()
    t("gram explode + rare join (materialize)")(gg.count())
    val m = gg.select(col("ng"), col("doc_id").as("d1"), col("p").as("p1"))
      .join(gg.select(col("ng"), col("doc_id").as("d2"), col("p").as("p2")), "ng")
      .filter(col("d1") < col("d2"))
      .withColumn("diag", col("p1") - col("p2"))
    val mc = t("positional self-join count")(m.count())
    println(s"SPAN matches=$mc")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
    val spans = m.withColumn("grp", col("p1") - row_number().over(w))
      .groupBy("d1", "d2", "diag", "grp")
      .agg(min("p1").as("start1"), count(lit(1)).as("n"))
      .filter(col("n") + 12 >= 16)
    t("window + island agg")(println("spans=" + spans.count()))
    gg.unpersist()
    spark.stop()
  }
}
