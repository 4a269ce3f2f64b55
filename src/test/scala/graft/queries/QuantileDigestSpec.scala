package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** The bottom-k-by-hash quantile digest's three contracts:
  * MERGEABILITY (bottom-k of a union == bottom-k of the two sides'
  * bottom-k's — the property that lets 1000 executors each ship a
  * 256-row summary instead of their partitions), the SAMPLING ERROR
  * BOUND (observed rank error of each estimate within 4σ of the
  * m-sample binomial bound — the "proven error bounds" a digest must
  * carry), and the PLAN SHAPE (the sample build compiles to
  * WindowGroupLimit, so only m rows per partition ever shuffle). */
class QuantileDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val m = 256

  private def hashed(dir: String) =
    graft.Tables.load(spark, dir, "events").selectExpr(
      "event_type", "event_id",
      "cast(round(value * 100, 0) as bigint) as c",
      s"${TemporalQueries.digestHashSpark} as h")

  private def bottomK(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
      .orderBy(col("h").asc, col("event_id").asc)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= m).drop("rk")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("event_type", "event_id", "c", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("digest merge is exact: bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))") {
    val e = hashed("/root/testdata/sf0.01")
    val a = e.filter(col("event_id") % 2 === 0)
    val b = e.filter(col("event_id") % 2 =!= 0)
    val merged = asSet(bottomK(bottomK(a).union(bottomK(b))))
    val direct = asSet(bottomK(e))
    assert(merged == direct, "merge of partial digests diverged from the " +
      s"direct digest: ${(merged diff direct).take(3)} vs ${(direct diff merged).take(3)}")
  }

  test("estimates respect the m-sample rank-error bound (4σ) at sf0.01") {
    // sf0.01 has ~2000 events/type, so m=256 is a REAL subsample (at
    // sf0.001 every group fits inside m and the digest is exact)
    val rows = graft.SparkEntry.queries("evt_quantile_digest")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 15) // 5 types x 3 quantiles
    val full = hashed("/root/testdata/sf0.01")
      .select("event_type", "c").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (et, p, est, kUsed) = (r.getAs[String]("event_type"),
        r.getAs[Long]("p"), r.getAs[Long]("est_cents"), r.getAs[Long]("k_used"))
      assert(kUsed == m, s"$et sampled $kUsed of an over-m group")
      val vals = full(et); val n = vals.length
      // observed rank of the estimate in the FULL group (fraction)
      val rank = vals.count(_ <= est).toDouble / n
      val q = p / 100.0
      val sigma = math.sqrt(q * (1 - q) / m)
      assert(math.abs(rank - q) <= 4 * sigma + 1.0 / m,
        s"$et p$p: estimate $est sits at rank $rank, " +
          f"beyond q=$q ± 4σ=${4 * sigma}%.4f")
    }
  }

  test("sample build compiles to WindowGroupLimit (fixed-size state per partition)") {
    val plan = graft.SparkEntry.queries("evt_quantile_digest")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "bottom-k sample must compile to WindowGroupLimit")
  }

  test("two-step hash == one-multiply hash below the overflow line, and stays safe above it") {
    // ADVICE r13 #4: event_id * 2654435761 overflows int64 above
    // ~3.47e9 — Spark wraps silently, DuckDB aborts. The two-step form
    // must be bit-identical to the naive form wherever the naive form
    // is exact, and must keep every intermediate below 2^63 for ALL
    // event_id (checked here one decade past the old overflow line,
    // where the wrapped naive product already disagrees with exact
    // modular arithmetic).
    val safe = spark.range(0, 2000000, 97)
      .union(spark.range(3400000000L, 3474000000L, 1000003))
      .selectExpr("id as event_id")
      .selectExpr(s"${TemporalQueries.digestHashSpark} as two_step",
        "pmod(event_id * 2654435761, 4294967296) as naive")
      .filter("two_step != naive").count()
    assert(safe == 0, "two-step hash diverged from the naive form in-domain")
    // above the line: the two-step form equals BigInt ground truth
    val big = spark.range(3500000000L, 40000000000L, 999999937L)
      .selectExpr("id as event_id")
      .selectExpr("event_id", s"${TemporalQueries.digestHashSpark} as h")
      .collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      val id = BigInt(r.getAs[Long]("event_id"))
      val want = (id * BigInt(2654435761L)).mod(BigInt(4294967296L))
      assert(BigInt(r.getAs[Long]("h")) == want,
        s"event_id $id: two-step ${r.getAs[Long]("h")} != exact $want")
    }
  }

  test("digest degenerates to exact quantiles when the group fits in m") {
    // sf0.001: ~200 events/type < m — est must EQUAL exact everywhere
    val rows = graft.SparkEntry.queries("evt_quantile_digest")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cents") == r.getAs[Long]("exact_cents"),
        s"under-m group diverged: $r")
    }
  }
}
