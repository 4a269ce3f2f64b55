package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Generalized-pivot fixpoint iterations (the reference's
  * GeneralizedPivotSetInfo / RecursionBase partitioning analog):
  *
  *   - pivot = head positions stable through the recursion (else the
  *     `spark.datalog.partitioning.<name>` override, else column 0);
  *   - with a stable pivot, static join sides broadcast and every
  *     iteration ≥1 runs with ZERO shuffle exchanges — the delta
  *     streams through the join, dedup, and the anti-join chain on one
  *     claimed hash layout;
  *   - results are identical to the legacy except(all) path.
  */
class PivotSpec extends AnyFunSuite {
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
  // deep chain so the fixpoint runs many distributed iterations
  private val chain = (0 until 24).map(i => s"$i,${i + 1}")

  private def runTc(tc: String, confs: (String, String)*) = {
    withConf(confs :+ ("spark.datalog.recursion.logplans" -> "true")
      :+ ("spark.datalog.recursion.localDeltaRows" -> "0"): _*) {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(db + tc)
      ctx.registerData("arc", chain)
      val rows = ctx.queryStrings("tc(A,B).").toSet
      (rows, ctx.lastPivot, ctx.iterationPlanLog)
    }
  }

  private val llTc = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
  private val rlTc = "tc(A,B) <- arc(A,B). tc(A,B) <- arc(A,C), tc(C,B)."

  private lazy val expected = withConf() {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(db + llTc)
    ctx.registerData("arc", chain)
    ctx.queryStrings("tc(A,B).").toSet
  }

  test("left-linear TC: stable pivot [0], zero shuffles in every iteration >= 1") {
    val (rows, pivot, log) =
      runTc(llTc, "spark.datalog.recursion.copartition.enabled" -> "true")
    assert(rows == expected)
    assert(pivot == Map("tc" -> Seq(0)), s"pivot was $pivot")
    val iters = log.filter(_._2 >= 1)
    assert(iters.nonEmpty)
    val shuffled = iters.filter(_._3 > 0)
    assert(shuffled.isEmpty,
      s"iterations with shuffles: ${shuffled.map(e => (e._1, e._2, e._3))}\n" +
        shuffled.headOption.map(_._4).getOrElse(""))
    // iteration 0 (exit rules from an unknown layout) pays the one
    // repartition that seeds the claimed layout
    assert(log.exists(e => e._2 == 0 && e._3 >= 1))
  }

  test("right-linear TC: stable pivot [1], zero shuffles in every iteration >= 1") {
    val (rows, pivot, log) =
      runTc(rlTc, "spark.datalog.recursion.copartition.enabled" -> "true")
    assert(rows == expected)
    assert(pivot == Map("tc" -> Seq(1)), s"pivot was $pivot")
    assert(log.filter(_._2 >= 1).forall(_._3 == 0))
  }

  test("partitioning override is honored and results are unchanged") {
    val (rows, pivot, _) = runTc(llTc,
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.partitioning.tc" -> "[1,1]")
    assert(rows == expected)
    assert(pivot == Map("tc" -> Seq(0, 1)), s"pivot was $pivot")
  }

  test("auto mode on local: stable-pivot cliques take the slice path, others legacy") {
    // LL TC has a stable pivot → the measured-faster zero-exchange loop
    // runs even locally (iteration plans captured)
    val (llRows, _, llLog) =
      runTc(llTc, "spark.datalog.recursion.copartition.enabled" -> "auto")
    assert(llRows == expected)
    assert(llLog.nonEmpty, "stable-pivot clique must auto-enable the slice path")
    assert(llLog.filter(_._2 >= 1).forall(_._3 == 0))
    // NL TC has no stable pivot → legacy except(all) locally (no slices)
    val nl = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), tc(C,B)."
    val (nlRows, _, nlLog) =
      runTc(nl, "spark.datalog.recursion.copartition.enabled" -> "auto")
    assert(nlRows == expected)
    assert(nlLog.isEmpty, "no stable pivot → legacy path on local masters")
  }

  test("slice path with default localization (mixed local/claimed chains) stays correct") {
    // default localDeltaRows localizes the small deltas → chains mix
    // LocalRelation slices with claimed checkpoints; anti-joins must
    // broadcast the local ones and stay correct
    val (rows, _, _) = withConf(
      "spark.datalog.recursion.copartition.enabled" -> "true") {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(db + llTc)
      ctx.registerData("arc", chain)
      val r = ctx.queryStrings("tc(A,B).").toSet
      (r, ctx.lastPivot, ctx.iterationPlanLog)
    }
    assert(rows == expected)
  }

  test("non-linear TC has no stable pivot but stays correct on the slice path") {
    val nl = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), tc(C,B)."
    val (rows, pivot, _) =
      runTc(nl, "spark.datalog.recursion.copartition.enabled" -> "true")
    assert(rows == expected)
    assert(pivot == Map("tc" -> Seq(0)), s"pivot was $pivot")
  }
}
