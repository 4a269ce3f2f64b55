package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Scale knobs of the embedding LSH path: configurable hyperplane count
  * (`spark.graft.lsh.bits`) and the per-bucket candidate cap
  * (`spark.graft.lsh.maxBucketSize`) that stops `emb_neardup` from going
  * quadratic inside a skewed hot bucket. */
class LshCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A pathologically skewed corpus: `n` near-identical vectors — every
    * one lands in the SAME hyperplane bucket and every pair clears the
    * near-dup threshold, the worst case for within-bucket pairing. */
  private def skewedFixture(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_skew_")
    val ss = spark
    import ss.implicits._
    (0 until n).map { i =>
      // base direction constant; a tiny last-dim wiggle keeps rows
      // distinct without flipping any hyperplane sign
      val v = Array.tabulate(64)(d => 1.0f + (if (d == 63) i * 1e-4f else 0f))
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("emb_neardup: hot-bucket pair generation is capped, not quadratic") {
    val n = 200
    val fixture = skewedFixture(n)
    val capped = spark.newSession()
    capped.conf.set("spark.graft.lsh.maxBucketSize", "10")
    val pairs = graft.queries.EmbeddingQueries.defs("emb_neardup")(capped, fixture)
    val got = pairs.count()
    // uncapped this bucket yields n*(n-1)/2 = 19900 pairs; the cap bounds
    // it at cap*(cap-1)/2
    assert(got == 45L, s"expected 10*9/2 capped pairs, got $got")
    graft.SparkEntry.release()
  }

  test("emb_neardup: default cap is a no-op at gate scale") {
    val n = 30
    val fixture = skewedFixture(n)
    val s = spark.newSession()
    val got = graft.queries.EmbeddingQueries.defs("emb_neardup")(s, fixture).count()
    assert(got == n.toLong * (n - 1) / 2, s"default cap must not drop pairs, got $got")
    graft.SparkEntry.release()
  }

  test("multi-probe lifts recall at high bits and stays bucket-joined") {
    import org.apache.spark.sql.GraftColumnBridge
    val dir = "/root/testdata/sf0.001"
    // 12 bits → 4096 buckets: sparse enough that single-bucket recall
    // visibly drops; probing one-bit-flip neighbors must recover some
    def recall(probes: Int): Long = {
      val s = spark.newSession()
      s.conf.set("spark.graft.lsh.bits", "12")
      s.conf.set("spark.graft.lsh.probes", probes.toString)
      val r = graft.queries.EmbeddingQueries.defs("emb_lsh_recall")(s, dir)
        .agg(sum("n_bucket_hits")).collect()(0).getLong(0)
      graft.SparkEntry.release()
      r
    }
    val single = recall(1)
    val multi = recall(13)
    assert(multi > single,
      s"probing 12 neighbor buckets found no extra true neighbors " +
        s"($single -> $multi)")
    // and the probed kNN is still a bucket-key join, never all-pairs
    val s = spark.newSession()
    s.conf.set("spark.graft.lsh.bits", "12")
    s.conf.set("spark.graft.lsh.probes", "13")
    val knn = graft.queries.EmbeddingQueries.defs("emb_knn_lsh")(s, dir)
    assert(knn.count() > 0)
    val plan = GraftColumnBridge.executedPlanString(knn)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "multi-probe kNN fell back to an all-pairs join")
    assert(plan.contains("bkt"), "kNN join lost its bucket key")
    graft.SparkEntry.release()
  }

  test("spark.graft.lsh.bits controls the bucket-space size") {
    // 4 bits → at most 16 buckets; more buckets than that means the conf
    // did not reach the bucketing expression
    val s4 = spark.newSession()
    s4.conf.set("spark.graft.lsh.bits", "4")
    val dir = "/root/testdata/sf0.001"
    val knn = graft.queries.EmbeddingQueries.defs("emb_knn_lsh")(s4, dir)
    assert(knn.count() > 0)
    // distinct buckets over the corpus, recomputed the way the query does
    import graft.Tables
    val nb = Tables.load(s4, dir, "embeddings")
      .selectExpr(
        """aggregate(transform(sequence(0,3), j ->
             if(aggregate(transform(sequence(0,63), i ->
                  cast(floor(cast(embedding[i] as double) * 1000.0) as bigint)
                    * (((i*31 + j*17) % 7) - 3)), cast(0 as bigint),
                  (s, x) -> s + x) > 0,
                shiftleft(1L, j), 0L)),
           0L, (s, x) -> s + x) as bkt""")
      .distinct().count()
    assert(nb <= 16, s"4-bit bucketing must yield <=16 buckets, got $nb")
    graft.SparkEntry.release()
  }
}
