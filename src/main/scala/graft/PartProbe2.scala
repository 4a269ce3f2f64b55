package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}

/** Validates the exchange-free co-partitioned anti-join design. */
object PartProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("x", "y")
    val a0 = spark.range(100000).selectExpr("id % 1000 as x", "id % 37 as y")
      .repartition(8, org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .dropDuplicates()
    val a = GraftColumnBridge.checkpointWithPartitioning(a0, keys, 8)
    println("claimed partitioning: " + a.queryExecution.executedPlan.outputPartitioning)
    val b = spark.range(5000).selectExpr("id % 2000 as x", "id % 37 as y")
      .repartition(8, org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .dropDuplicates()
    val cond = keys.map(k => b(k) === a(k)).reduce(_ && _)
    val anti = b.join(a.hint("shuffle_hash"), cond, "left_anti")
    val plan = anti.queryExecution.executedPlan.toString
    println("=== anti-join physical ===")
    println(plan)
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    println(s"exchanges in plan: $exchanges (want 1 — only b's repartition)")
    println("rows: " + anti.count())
    // ground truth via except
    val truth = b.exceptAll(a.select(b.columns.map(org.apache.spark.sql.functions.col): _*)).count()
    println("except rows: " + truth)
    spark.stop()
  }
}
