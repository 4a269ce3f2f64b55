package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** In-JVM oracles for the containment-dedup and proximity-search gates
  * at sf0.001: brute-force ALL-PAIRS containment (so the rare-shingle
  * blocking's recall story is asserted, not assumed) and naive
  * position-list scanning for the sloppy-phrase match. */
class ContainmentProximitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("txt_containment: sound vs brute-force all-pairs; misses explained by blocking") {
    import graft.functions.GraftFunctions.{shingle3SortedSet, tokenHash64}
    val sh = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        shingle3SortedSet(tokenHash64(split(col("text"), " "))).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    val docIds = sh.keys.toSeq.sorted
    val brute = (for {
      i <- docIds.indices.iterator; j <- (i + 1 until docIds.size).iterator
      a = docIds(i); b = docIds(j)
      inter = (sh(a) intersect sh(b)).size.toLong
      mn = math.min(sh(a).size, sh(b).size).toLong
      if inter * 10 >= mn * 9
    } yield (a, b, inter, mn)).toSet
    val got = run("txt_containment").collect().map(r =>
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_min"))).toSet
    // sound: everything reported is a true containment pair with the
    // exact intersect/min values the brute force computes
    assert(got.subsetOf(brute), s"false positives: ${(got -- brute).take(3)}")
    assert(got.nonEmpty)
    // complete up to the documented blocking policy: a missed pair must
    // have NO shared rare shingle (global df <= 20) — anything else
    // would be a recall bug, not a policy consequence
    val df = sh.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size)
    val rare = df.filter(_._2 <= 20).keys.toSet
    val missed = brute -- got
    assert(missed.forall { case (a, b, _, _) =>
      (sh(a) intersect sh(b) intersect rare).isEmpty
    }, s"pairs missed despite a shared rare shingle: ${missed.take(3)}")
    PackResources.releaseAll()
  }

  test("txt_proximity matches brute-force position scanning") {
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    val expected = (for {
      q <- 1L to 4L
      t1 = toks(q)(0); t2 = toks(q)(4)
      (d, ts) <- toks.toSeq
      hits = for {
        (w1, p1) <- ts.zipWithIndex if w1 == t1
        (w2, p2) <- ts.zipWithIndex
        if w2 == t2 && p2 != p1 && math.abs(p2 - p1) <= 6
      } yield math.min(p1, p2)
      if hits.nonEmpty
    } yield (q, d, hits.size.toLong, (hits.min + 1).toLong)).toSet
    val got = run("txt_proximity").collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
