package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.datalog.TestSpark

/** JoinOps.bloomPruneFact: the runtime bloom semi-join filter must be
  * (a) result-invariant — false positives only, the exact join above
  * removes them; (b) actually pruning — fact rows with keys far from
  * the build set are dropped BEFORE the exchange; (c) sound on the
  * empty build side; (d) a codegen'd broadcast probe in the plan, not
  * a literal sketch in every task binary. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pruned join equals the plain join; far keys are pruned") {
    import spark.implicits._
    // fact keys 0..9999; build keys = multiples of 97 under 2000
    val fact = spark.range(10000).select(
      col("id").as("k"), (col("id") % 7).as("v"))
    val build = spark.range(21).select((col("id") * 97).as("bk"))
    val pruned = JoinOps.bloomPruneFact(fact, col("k"), build, col("bk"),
      expectedItems = 1 << 12)
    val prunedCount = pruned.count()
    assert(prunedCount < 10000 / 4,
      s"bloom pruned nothing ($prunedCount of 10000 kept)")
    val exact = pruned.join(build, col("k") === col("bk"))
      .groupBy("v").agg(count(lit(1)).as("n")).as[(Long, Long)]
      .collect().toSet
    val plain = fact.join(build, col("k") === col("bk"))
      .groupBy("v").agg(count(lit(1)).as("n")).as[(Long, Long)]
      .collect().toSet
    assert(exact == plain, "bloom pruning changed the join result")
  }

  test("mismatched key types fail loudly instead of silently pruning") {
    // xxhash64 is type-dependent: int 5 and bigint 5 hash apart, so a
    // type-mismatched probe would drop every true match — the helper
    // must reject the call (Spark's InjectRuntimeFilter makes the same
    // matching-sides demand)
    val fact = spark.range(100).select(col("id").cast("int").as("k"))
    val build = spark.range(10).select(col("id").as("bk"))
    val e = intercept[IllegalArgumentException] {
      JoinOps.bloomPruneFact(fact, col("k"), build, col("bk"))
    }
    assert(e.getMessage.contains("types must match"))
  }

  test("empty build side yields an empty (not failed) result") {
    val fact = spark.range(100).select(col("id").as("k"))
    val build = spark.range(10).select(col("id").as("bk")).filter(col("bk") < 0)
    assert(JoinOps.bloomPruneFact(fact, col("k"), build, col("bk")).count() == 0)
  }

  test("the probe is the broadcast codegen kernel, below the exchange") {
    val fact = spark.range(1000).select(col("id").as("k"))
    val build = spark.range(10).select((col("id") * 3).as("bk"))
    val pruned = JoinOps.bloomPruneFact(fact, col("k"), build, col("bk"))
    val joined = pruned.hint("shuffle_hash").join(build, col("k") === col("bk"))
    // structural: every Filter carrying the probe sits BELOW any
    // exchange (its subtree has none) — i.e. it prunes rows before
    // they shuffle. (Catalyst also infers the probe onto the build
    // side via the join equivalence; that copy must satisfy the same
    // below-the-exchange property, so the forall covers both.)
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = joined.queryExecution.sparkPlan
    val probeFilters = plan.collect {
      case f: FilterExec
        if f.condition.toString.contains("bloom_might_contain_bc") => f
    }
    assert(probeFilters.nonEmpty,
      "broadcast bloom probe missing from the physical plan")
    assert(probeFilters.forall(
      f => f.collect { case e: Exchange => e }.isEmpty),
      "bloom probe evaluated above an exchange — prunes nothing")
  }
}
