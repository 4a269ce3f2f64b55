package graft.queries

import org.apache.spark.sql.GraftColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** emb_ivfpq_search — the IVF+PQ (ADC) query path. The DuckDB gate pins
  * exact scores at three scales; this spec pins the two things the gate
  * can't see: the plan shape the 100 TB story claims, and the ANN
  * quality contract (ADC top-k must actually rank near the exact
  * answer on this data, or the operator is a correct implementation of
  * a useless index). */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("plan: one corpus join pair, broadcast probe side, partial top-k") {
    val df = graft.queries.EmbeddingQueries.defs("emb_ivfpq_search")(spark, dir)
    val plan = GraftColumnBridge.executedPlanString(df)
    // candidate scoring rides a broadcast of probes+LUTs, never a
    // corpus-sized shuffle join against the query side
    assert(plan.contains("BroadcastExchange"), "probe/LUT side must broadcast")
    // the ONE corpus-shuffle join is assignment ⨝ codes on vec_id
    val smj = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"expected at most one corpus shuffle join, saw $smj:\n" +
      plan.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        .mkString("\n"))
    // every argmax/top-k runs as WindowGroupLimit (partial top-k below
    // the exchange — the ×nCells candidate rows never shuffle)
    assert(plan.contains("WindowGroupLimit"),
      "argmax/top-k must compile to WindowGroupLimit")
  }

  test("index-build argmaxes are map-side partial aggs, not window sorts") {
    // IVF assignment and PQ coding pick ONE winner per key — a
    // max(struct(...)) aggregation (the LPA argmax pattern) collapses
    // the ×nCells candidate rows map-side via its PARTIAL pass before
    // the exchange; a row_number window would shuffle and sort every
    // candidate row. Assert no Window node of any kind (row_number
    // compiles to Window / WindowGroupLimit) survives in either
    // index-build plan, and the partial pass is present.
    for ((tag, df) <- Seq(
        "ivfAssigned" -> EmbeddingQueries.ivfAssignedBuild(spark, dir),
        "pqCodeRows" -> EmbeddingQueries.pqCodeRowsBuild(spark, dir))) {
      val plan = GraftColumnBridge.executedPlanString(df)
      assert(!plan.contains("Window"),
        s"$tag plan still contains a window operator:\n" +
          plan.linesIterator.filter(_.contains("Window")).mkString("\n"))
      assert(plan.contains("partial_max"),
        s"$tag plan lost its map-side partial argmax:\n$plan")
    }
  }

  test("ADC ranking overlaps the exact top-10 (index quality floor)") {
    import scala.jdk.CollectionConverters._
    val s = spark
    val adc = graft.queries.EmbeddingQueries.defs("emb_ivfpq_search")(s, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val exact = graft.queries.EmbeddingQueries.defs("emb_knn")(s, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    // 5 queries × top-5 ADC vs top-10 exact: IVF(nProbe=2) + 4-bit PQ is
    // lossy by design (measured 7/25 on this fixture), but chance
    // overlap on 500 docs is ~0.25/25 — a formula/LUT regression
    // (wrong slot indexing, swapped subspace, sign error) craters the
    // overlap to ~0, so a 20% floor separates broken from lossy
    val hits = adc.count(exact.contains)
    assert(adc.size == 25, s"expected 25 ADC results, got ${adc.size}")
    assert(hits >= adc.size / 5,
      s"ADC top-5 shares only $hits/${adc.size} with the exact top-10")
  }

  test("nprobe = nCells degenerates IVF search to the exact top-5") {
    // with every coarse cell probed the candidate set is the whole
    // corpus, so full-precision IVF search must EQUAL brute force —
    // the invariant that pins the probe plumbing (a dropped cell, an
    // off-by-one rank bound, or a probe/assignment key mismatch all
    // break exactness here while staying plausible at nprobe=2)
    val s = spark.newSession()
    s.conf.set("spark.graft.ivf.nprobe", "10")
    val ivf = graft.queries.EmbeddingQueries.defs("emb_ivf_search")(s, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk")) ->
        (r.getAs[Long]("cid"), r.getAs[Long]("dot"))).toMap
    val exact = graft.queries.EmbeddingQueries.defs("emb_knn")(s, dir)
      .collect().filter(_.getAs[Long]("rk") <= 5)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk")) ->
        (r.getAs[Long]("cid"), r.getAs[Long]("dot"))).toMap
    assert(ivf.size == 25 && ivf == exact,
      s"full-probe IVF diverged from brute force: ${ivf.toSeq.diff(exact.toSeq).take(3)}")
  }
}
