package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** The salted join must actually SPREAD a hot key: with one key holding
  * ~all fact rows, the unsalted join melts one reducer; the salted join
  * bounds every reducer near |hot| / SaltR. */
class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join spreads a single hot key across reducers") {
    val n = 20000
    // 95% of rows hit key 7; event_id is the row-local salt source
    val events = spark.range(n).selectExpr(
      "case when id % 20 = 0 then id % 5 else 7 end as user_id",
      "id as event_id", "id % 100 as cents")
    val customer = spark.range(10).selectExpr(
      "id as c_custkey", "concat('SEG', id % 3) as c_mktsegment")

    // correctness vs the unsalted join
    val got = SkewOps.saltedJoinAgg(events, customer)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = events.join(customer, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"salting changed the result: $got vs $want")

    // spread: observe the join's shuffle layout through the partition id
    // of each joined row BEFORE aggregation
    val fact = events.withColumn("salt", pmod(col("event_id"), lit(SkewOps.SaltR.toLong)))
    val dim = customer.crossJoin(
      spark.range(SkewOps.SaltR).select(col("id").as("salt")))
    val joined = fact.join(dim,
      fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      // explicit partition count so AQE's small-shuffle coalescing does
      // not fold the (tiny) test exchange back into one partition
      .repartition(32, col("c_custkey"), fact("salt"))
    val perPart = joined.groupBy(spark_partition_id().as("p"))
      .agg(count(lit(1)).as("cnt")).collect().map(_.getLong(1))
    val hot = n * 19 / 20
    assert(perPart.max < hot / 2,
      s"hot key not spread: max partition ${perPart.max} of $hot hot rows " +
        s"(distribution ${perPart.sorted.reverse.take(5).mkString(",")})")
  }
}
