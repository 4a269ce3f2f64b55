package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation: the salted join.
  *
  * AQE's skew-join splitter (OptimizeSkewedJoin) handles sort-merge
  * shuffle skew at runtime, but it cannot help when the hot key's rows
  * must still co-locate (aggregation above the join) or when the join
  * degenerates before AQE sees it. The classic fix is structural:
  *
  *  - FACT side: add `salt = uniform row-local value mod R` — the hot
  *    key's rows spread over R reducer partitions;
  *  - DIM side: replicate each row R times (one per salt value) — dim
  *    cardinality × R stays small by assumption;
  *  - join on (key, salt) instead of (key).
  *
  * The rewrite is RESULT-INVARIANT (every fact row still meets exactly
  * its key's dim row), so the unsalted join is the correctness oracle.
  * At 100 TB this bounds the largest reducer at |hot key| / R instead
  * of |hot key|.
  */
object SkewOps {

  /** Number of salt buckets; 8 spreads a hot key 8-wide while costing
    * only an 8× dim-side replication (dims are small by contract). */
  val SaltR = 8

  /** events ⋈ customer on user_id = c_custkey, salted, aggregated per
    * market segment — count and exact integer-cents sum. `saltCol` uses
    * the row-local event_id (deterministic, uniform mod R — no RNG, so
    * replays and retries salt identically). */
  def saltedJoinAgg(events: DataFrame, customer: DataFrame): DataFrame = {
    val fact = events.withColumn("salt", pmod(col("event_id"), lit(SaltR.toLong)))
    val dim = customer.crossJoin(
      customer.sparkSession.range(SaltR).select(col("id").as("salt")))
    fact.join(dim,
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
  }
}
