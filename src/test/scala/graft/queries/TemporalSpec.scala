package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** In-JVM oracles for the temporal joins at sf0.001: brute-force as-of
  * matching and naive interval overlap over the collected events table.
  * The DuckDB gate (native ASOF JOIN / BETWEEN join) is the
  * authoritative cross-engine check; these pin the semantics against an
  * implementation-independent formulation small enough to eyeball. */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private lazy val events = graft.Tables.load(spark, dir, "events")
    .selectExpr("event_id", "user_id", "ts div 1000 as tsu", "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("evt_asof_join matches brute-force most-recent-click-at-or-before") {
    val clicks = events.filter(_._4 == "click")
    val purchases = events.filter(_._4 == "purchase")
    val expected = purchases.map { case (pid, uid, pts, _, _) =>
      val best = clicks.filter(c => c._2 == uid && c._3 <= pts)
      // tie-break mirrors the query: latest ts, then highest event id
      val pick = if (best.isEmpty) None
        else Some(best.maxBy(c => (c._3, c._1)))
      (pid, uid, pick.map(_._1), pick.map(_._5))
    }.toSet
    val got = run("evt_asof_join").collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.longValue),
        Option(r.getAs[java.lang.Double]("click_value")).map(_.doubleValue))
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._3.isDefined))
  }

  test("evt_range_join matches naive per-window filtering") {
    val anchor = 1704067200000000L
    val hour = 3600000000L
    val expected = (0L until 180L).flatMap { k =>
      val lo = anchor + k * 4 * hour
      val hi = lo + 6 * hour
      val in = events.filter(e => e._3 >= lo && e._3 < hi)
      if (in.isEmpty) None
      else Some((k, in.length.toLong,
        // HALF_UP matches Spark's round(x, 0) (half away from zero);
        // math.round (half toward +Inf) would disagree on negative
        // half-cent values if the generator ever emitted them
        in.map(e => BigDecimal(e._5 * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum))
    }.toSet
    val got = run("evt_range_join").collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_value_cents"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("evt_range_join candidate generation is bucketed, not cartesian") {
    val plan = run("evt_range_join").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "range join must never degrade to a cartesian product")
  }

  test("evt_interval_merge matches brute-force interval coalescing") {
    val HalfHour = 1800000000L
    val expected = events.groupBy(_._2).flatMap { case (uid, evs) =>
      val ivs = evs.map(e => (e._3, e._3 + HalfHour)).sorted
      // left fold over the sorted intervals: islands are disjoint and
      // ordered, so the current island's end IS the running max the
      // gate's window computes
      var islands = List.empty[(Long, Long, Long)]
      for ((lo, hi) <- ivs) islands match {
        case (s0, e0, n0) :: rest if lo <= e0 =>
          islands = (s0, math.max(e0, hi), n0 + 1) :: rest
        case _ => islands = (lo, hi, 1L) :: islands
      }
      islands.reverse.zipWithIndex.map { case ((s0, e0, n0), i) =>
        (uid, i.toLong, s0, e0, n0)
      }
    }.toSet
    val got = run("evt_interval_merge").collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("island"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
        r.getAs[Long]("n_events"))).toSet
    assert(got == expected)
    // the merge must actually coalesce something (multi-event islands)
    assert(got.exists(_._5 > 1))
  }
}
