package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** In-JVM independent oracles for the retrieval gates (txt_bm25_topk,
  * txt_hybrid_rrf, mm_phash, mm_phash_pairs) at sf0.001 — the DuckDB
  * gate is the authoritative cross-engine check; these recompute the
  * same results from the RAW parquet with plain Scala (BigInt exact
  * arithmetic, brute-force all-pairs) so a regression is caught in
  * `sbt test` without DuckDB, and the BLOCKED plans are proven equal to
  * their unblocked definitions (band pigeonhole completeness). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private lazy val docsText: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Brute-force exact-integer BM25 (the gate's formula, BigInt). */
  private lazy val bm25Brute: Map[(Long, Long), (Long, Long)] = {
    val toks = docsText.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = BigInt(toks.size)
    val l = BigInt(toks.valuesIterator.map(_.size.toLong).sum)
    val df = toks.valuesIterator.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (t, xs) => t -> BigInt(xs.size) }
    val out = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    for (q <- 1L to 8L) {
      val t = toks(q)
      val qTerms = (0 until 4).map(i => t(((i * 7) % t.size))).distinct
      val scores = toks.toSeq.map { case (d, dt) =>
        val dl = BigInt(dt.size)
        val s = qTerms.map { term =>
          val tf = BigInt(dt.count(_ == term))
          if (tf == 0) BigInt(0)
          else {
            val fq = df(term)
            ((2 * n - 2 * fq + 1) * 44 * l * tf * 1000000) /
              ((2 * fq + 1) * (20 * l * tf + 6 * l + 18 * dl * n))
          }
        }.sum
        (d, s)
      }.filter(_._2 > 0)
      scores.sortBy { case (d, s) => (-s, d) }.take(10).zipWithIndex
        .foreach { case ((d, s), i) =>
          out((q, d)) = (s.toLong, i + 1L)
        }
    }
    out.toMap
  }

  test("txt_bm25_topk equals the BigInt brute-force formula") {
    val got = run("txt_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == bm25Brute, {
      val diff = (got.keySet ++ bm25Brute.keySet)
        .filter(k => got.get(k) != bm25Brute.get(k)).take(5)
      s"mismatched keys: ${diff.map(k => (k, got.get(k), bm25Brute.get(k)))}"
    })
    assert(got.nonEmpty)
  }

  test("txt_hybrid_rrf: fused score is exactly the RRF of its arm ranks") {
    val rows = run("txt_hybrid_rrf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rrf, rkB, rkE) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val expect =
        (if (rkB > 0) 1000000L / (60 + rkB) else 0L) +
          (if (rkE > 0) 1000000L / (60 + rkE) else 0L)
      assert(rrf == expect, s"row $r")
      assert(rkB >= 0 && rkB <= 10 && rkE >= 0 && rkE <= 10)
      assert(rkB > 0 || rkE > 0, s"doc in neither arm: $r")
    }
    // bm25 arm ranks embedded in the fusion must agree with the gate
    val bmArm = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
      .filter(_._2 > 0).toMap
    bmArm.foreach { case (k, rk) =>
      assert(bm25Brute.get(k).exists(_._2 == rk),
        s"$k: fused rk_bm25 $rk vs brute ${bm25Brute.get(k)}")
    }
  }

  /** Brute 63-bit dHash (independent implementation: char codes). */
  private def bruteHash(text: String): Long = {
    val g = Array.tabulate(72)(i => text.charAt(i * text.length / 72).toLong)
    (0 until 63).foldLeft(0L) { (acc, j) =>
      acc + (if (g(j + j / 8) > g(j + j / 8 + 1)) 1L << j else 0L)
    }
  }

  test("mm_phash equals the brute dHash; banded pairs equal brute all-pairs") {
    val got = run("mm_phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = docsText.map { case (id, t) => id -> bruteHash(t) }.toMap
    assert(got == brute)
    // pairs gate runs on corpus ∪ variants — rebuild that set brute-force
    val aug = docsText.flatMap { case (id, t) =>
      Seq(id -> t, (id + 1000000L) -> ("z" + t.substring(1)))
    }.map { case (id, t) => id -> bruteHash(t) }
    val brutePairs = (for {
      (d1, h1) <- aug; (d2, h2) <- aug
      if d1 < d2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (d1, d2, java.lang.Long.bitCount(h1 ^ h2).toLong)).toSet
    val gotPairs = run("mm_phash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // band blocking must be COMPLETE for hamming <= 3 (4-band pigeonhole)
    assert(gotPairs == brutePairs,
      s"missing=${(brutePairs -- gotPairs).take(3)} extra=${(gotPairs -- brutePairs).take(3)}")
    assert(gotPairs.nonEmpty)
  }
}
