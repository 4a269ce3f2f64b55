package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between our custom Catalyst expressions and the public Column
  * API: `classic.ExpressionUtils` is `private[sql]`, so this one-file
  * shim lives in the org.apache.spark.sql namespace (the standard
  * library-extension pattern — no Spark internals are modified). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize `df` (localCheckpoint semantics) while *preserving* a
    * hash partitioning claim over `keyCols`: the input MUST physically
    * have that layout (i.e. be the direct result of
    * `repartition(numParts, keyCols)` or of exchange-free operators on
    * top of it — caller's contract). Spark's own
    * `Dataset.localCheckpoint` loses the partitioning (LogicalRDD comes
    * back with UnknownPartitioning under AQE), which forces a
    * re-exchange of the accumulated fact set on every fixpoint
    * iteration; this keeps iterative anti-joins exchange-free. */
  def checkpointWithPartitioning(
      df: DataFrame, keyCols: Seq[String], numParts: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // materialize eagerly
    val output = qe.analyzed.output
    val partitioning = catalyst.plans.physical.HashPartitioning(
      keyCols.map(c => output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column $c in ${output.map(_.name)}"))),
      numParts)
    classic.Dataset.ofRows(spark,
      execution.LogicalRDD(output, rdd, partitioning, Nil, isStreaming = false)(spark))
  }

  /** Register a function builder in an existing session's registry (for
    * sessions not built with `spark.sql.extensions=GraftExtensions`). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
