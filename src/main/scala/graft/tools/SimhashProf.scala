package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the two sf1.0 heavy-tail pair gates: stage-by-stage walls
  * for txt_simhash_pairs (band-join volume vs dedup) and
  * txt_ngram_jaccard (first-token candidate volume vs verify joins). */
object SimhashProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.GraftFunctions.{shingle3SortedSet, sortedIntersectCount, tokenHash64}
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id"),
      shingle3SortedSet(tokenHash64(split(col("text"), " "))).as("s"))
      .localCheckpoint()
    t("shingle_pass")(sh.count())
    val blocked = docs.selectExpr("doc_id", "split(text, ' ')[0] as tok1")
    val cand = blocked.select(col("tok1"), col("doc_id").as("d1"))
      .join(blocked.select(col("tok1"), col("doc_id").as("d2")), "tok1")
      .filter(col("d1") < col("d2")).select("d1", "d2")
    t("tok1_candidates")(cand.count())
    val s1 = sh.select(col("doc_id").as("d1"), col("s").as("s1"))
    val s2 = sh.select(col("doc_id").as("d2"), col("s").as("s2"))
    val j1 = cand.join(s1, "d1")
    t("attach_s1")(j1.count())
    val j2 = j1.join(s2, "d2")
    t("attach_s2")(j2.count())
    val verified = j2
      .select(col("d1"), col("d2"),
        sortedIntersectCount(col("s1"), col("s2")).as("n_inter"),
        (size(col("s1")) + size(col("s2"))).cast("long").as("sz"))
      .select(col("d1"), col("d2"), col("n_inter"),
        (col("sz") - col("n_inter")).as("n_union"))
      .filter(col("n_inter") * 10 >= col("n_union") * 3)
    t("verify_full")(verified.count())
    println("PLAN " + verified.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.trim.take(120)).mkString(" | "))
    spark.stop()
  }
}
