package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** One-time validated hash claims on BIG static sides of recursive-rule
  * joins (`spark.datalog.recursion.staticclaims`, r19): instead of
  * Catalyst re-planning the static side every iteration (per-round
  * broadcast HashedRelation rebuild, or SMJ re-exchange+re-sort on the
  * hinted paths), the static pre-partitions ONCE on its compiled join
  * keys and each iteration's rule join is a shuffled-hash probe with
  * the frontier as build side. `auto` engages only where the loop
  * would NOT force-broadcast (the zero-exchange broadcast loop measured
  * faster on warm local[32]); `true` forces claims over the broadcast
  * loop (cluster lever / this spec's hook). Asserts: engagement is
  * size-gated, results under forced engagement are identical to the
  * broadcast path (with and without the diffflip's
  * candidate-materialization arm), auto leaves the copart broadcast
  * loop alone, and the non-copart path engages under auto. */
class StaticClaimsSpec extends AnyFunSuite {
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
  private val arcs =
    (0 until 20).map(i => s"$i,${i + 1}") ++
    (1 until 32).map(i => s"${i / 2 + 100},${i + 100}") ++
    Seq("20,100")

  /** Run TC and return (rows, claimedPreds). */
  private def runTc(confs: (String, String)*): (Set[String], Set[String]) =
    withConf(confs ++ Seq(
        "spark.datalog.recursion.copartition.enabled" -> "true",
        // force the cluster path: no driver-resident or localized slices
        "spark.datalog.recursion.localDeltaRows" -> "0"): _*) {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(db + llTc)
      ctx.registerData("arc", arcs)
      val rows = ctx.queryStrings("tc(A,B).").toSet
      (rows, ctx.lastClaimedStatics)
    }

  test("tiny statics never claim (size gate), even when claims are forced on") {
    val (rows, claimed) =
      runTc("spark.datalog.recursion.staticclaims" -> "true")
    assert(rows.nonEmpty)
    assert(claimed.isEmpty, s"claimed at test scale: $claimed")
  }

  test("auto leaves the copart broadcast loop alone under a tiny threshold") {
    val (rows, claimed) =
      runTc("spark.sql.autoBroadcastJoinThreshold" -> "1")
    assert(rows.nonEmpty)
    assert(claimed.isEmpty, s"auto claimed over the broadcast loop: $claimed")
  }

  test("forced engagement (true + 1-byte threshold) claims arc, matches broadcast") {
    val (base, _) = runTc()
    val (rows, claimed) = runTc(
      "spark.datalog.recursion.staticclaims" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "1")
    assert(claimed == Set("arc"), s"claimed: $claimed")
    assert(rows == base)
  }

  test("claims + forced diffflip (candidate-materialization arm) match") {
    val (base, _) = runTc()
    val (rows, claimed) = runTc(
      "spark.datalog.recursion.staticclaims" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "1",
      "spark.datalog.recursion.diffflip" -> "true")
    assert(claimed == Set("arc"))
    assert(rows == base)
  }

  test("staticclaims=false keeps the legacy resolution under a tiny threshold") {
    val (base, _) = runTc()
    val (rows, claimed) = runTc(
      "spark.sql.autoBroadcastJoinThreshold" -> "1",
      "spark.datalog.recursion.staticclaims" -> "false")
    assert(claimed.isEmpty)
    assert(rows == base)
  }

  test("non-copart (except) path engages under AUTO and matches") {
    val run = (claims: String) =>
      withConf(
        "spark.datalog.recursion.copartition.enabled" -> "false",
        "spark.datalog.recursion.localDeltaRows" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "1",
        "spark.datalog.recursion.staticclaims" -> claims) {
        val ctx = new DatalogContext(spark)
        ctx.loadProgram(db + llTc)
        ctx.registerData("arc", arcs)
        (ctx.queryStrings("tc(A,B).").toSet, ctx.lastClaimedStatics)
      }
    val (autoRows, autoClaimed) = run("auto")
    val (offRows, offClaimed) = run("false")
    assert(autoClaimed == Set("arc"), s"auto did not engage: $autoClaimed")
    assert(offClaimed.isEmpty)
    assert(autoRows == offRows)
  }
}
