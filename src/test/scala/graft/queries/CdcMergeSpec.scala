package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** The CDC MERGE execution-path twins: q40_cdc_bigdim must return
  * byte-identical rows to q37_cdc_merge while its plan holds the
  * broadcast-free shape a snapshot-sized change batch needs at 100 TB
  * (both sides key-partitioned into a shuffle merge join — AQE's
  * broadcast pick is a driver OOM there, not an optimization). */
class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet

  test("big-dim variant returns exactly the broadcast variant's rows") {
    val a = rows("q37_cdc_merge")
    val b = rows("q40_cdc_bigdim")
    assert(a == b, s"variants diverged: ${(a diff b).take(3)} vs ${(b diff a).take(3)}")
    // sf0.001 gives every customer an order, so no "kept" rows exist
    // at this scale — U and I (and the D filter) are the exercised arms
    assert(a.exists(_._4 == "updated") && a.exists(_._4 == "inserted"),
      "change batch exercised only part of MERGE")
  }

  test("big-dim plan: the MERGE join shuffles both sides, never broadcasts") {
    val plan = graft.SparkEntry.queries("q40_cdc_bigdim")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      "MERGE must be a full-outer sort-merge join")
    assert(!plan.contains("BroadcastHashJoin"),
      "big-dim variant must not broadcast either MERGE side:\n" +
        plan.linesIterator.filter(_.contains("Broadcast")).mkString("\n"))
  }
}
