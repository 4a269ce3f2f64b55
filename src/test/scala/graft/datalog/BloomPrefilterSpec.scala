package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** The bloom pre-filter on the diffflip set difference
  * (`spark.datalog.recursion.bloomprefilter`): a per-predicate sketch
  * over the accumulated fact set — populated during the existing
  * checkpoint jobs — lets certainly-new candidates skip the semi-join
  * hash build (the membership half of the reference's SetRDD layer,
  * SetRDD.scala:29-167, as a sketch). Asserts: results are
  * hash-identical with the pre-filter on vs off, the split actually
  * engages, iterations stay zero-exchange, a SATURATED sketch (fpp→1)
  * degrades to correct results, and the one-time schema widening
  * re-inserts the widened hashes (values beyond 2^31 stay exact). */
class BloomPrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[T](kvs: (String, String)*)(f: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val db = "database({arc(X:integer, Y:integer)})."
  private val llTc = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
  // chain + a binary-tree fan: long fixpoint (compaction triggers) with
  // real duplicate re-derivations for the sketch to catch
  private val arcs =
    (0 until 20).map(i => s"$i,${i + 1}") ++
    (1 until 32).map(i => s"${i / 2 + 100},${i + 100}") ++
    Seq("20,100")

  private def runTc(bloom: String, extra: (String, String)*) =
    withConf(Seq(
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.recursion.diffflip" -> "true",
      "spark.datalog.recursion.bloomprefilter" -> bloom,
      // cap the sketch small: logplans captures every iteration's plan
      // string and an over-sized sketch would ride it as a hex literal
      // (also truncated since the r10 executedPlanString guard)
      "spark.datalog.recursion.bloomprefilter.expecteditems" -> "1024",
      "spark.datalog.recursion.logplans" -> "true",
      "spark.datalog.recursion.localDeltaRows" -> "0") ++ extra: _*) {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(db + llTc)
      ctx.registerData("arc", arcs)
      val rows = ctx.queryStrings("tc(A,B).").toSet
      val (splits, log) = (ctx.bloomPrefilterSplits, ctx.iterationPlanLog)
      ctx.close()
      (rows, splits, log)
    }

  test("bloom on == bloom off (hash-identical TC); split engages; zero exchanges") {
    val (off, offSplits, _) = runTc("false")
    val (on, splits, log) = runTc("true")
    assert(on == off)
    assert(on.nonEmpty)
    assert(offSplits == 0)
    assert(splits > 0, "bloom pre-filter never narrowed a semi build")
    val iters = log.filter(_._2 >= 1)
    assert(iters.nonEmpty)
    // the pre-filter must not cost the claimed layout its exchanges
    assert(iters.forall(_._3 == 0),
      s"exchanges per iteration: ${iters.map(t => (t._2, t._3))}")
    // and the sketch probe is actually in the plan (codegen'd predicate)
    assert(iters.exists(_._4.contains("might_contain")),
      "no might_contain in any iteration plan — pre-filter did not engage")
  }

  test("saturated sketch (expecteditems=8, fpp->1) still yields exact results") {
    val (off, _, _) = runTc("false")
    val (on, splits, _) = runTc("true",
      "spark.datalog.recursion.bloomprefilter.expecteditems" -> "8",
      "spark.datalog.recursion.bloomprefilter.fpp" -> "0.5")
    assert(splits > 0)
    assert(on == off)
  }

  test("auto mode gates the probe on accumulated facts (minrows)") {
    val (off, _, _) = runTc("false")
    // threshold far above the fact count: hashes accumulate but the
    // probe never engages — auto must cost nothing on tiny fixpoints
    val (aboveRows, aboveSplits, _) = runTc("auto",
      "spark.datalog.recursion.bloomprefilter.minrows" -> "1000000")
    assert(aboveSplits == 0, "auto engaged below its minrows threshold")
    assert(aboveRows == off)
    // threshold below the seed size: engages like forced mode
    val (belowRows, belowSplits, _) = runTc("auto",
      "spark.datalog.recursion.bloomprefilter.minrows" -> "4")
    assert(belowSplits > 0, "auto never engaged past its minrows threshold")
    assert(belowRows == off)
  }

  test("schema widening re-inserts widened hashes: values past 2^31 stay exact") {
    withConf(
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.recursion.diffflip" -> "true",
      "spark.datalog.recursion.bloomprefilter" -> "true",
      "spark.datalog.recursion.localDeltaRows" -> "0") {
      val ctx = new DatalogContext(spark)
      // int-typed constant seed, long-typed facts: iteration 1 widens
      // the seed slice — its rows re-hash under the widened types, so
      // the sketch keeps covering the whole chain (a stale-hash bloom
      // would false-negative the seed and duplicate it into the delta)
      ctx.loadProgram(
        "database({arc(X:long, Y:long)}). " +
          "reach(X) <- X=0. reach(Y) <- reach(X), arc(X,Y).")
      ctx.registerData("arc",
        Seq("0,5000000000", "5000000000,5000000001", "5000000001,0",
          "5000000001,5000000002"))
      val rows = ctx.queryStrings("reach(A).")
      // duplicates are the failure mode a stale-hash bloom would cause
      // (a false-negatived seed row re-entering the delta via the cycle)
      assert(rows.size == rows.toSet.size, s"duplicate facts: $rows")
      assert(rows.toSet ==
        Set("[0]", "[5000000000]", "[5000000001]", "[5000000002]"))
      ctx.close()
    }
  }
}
