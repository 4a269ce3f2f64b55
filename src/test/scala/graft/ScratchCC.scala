package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: iteration profile of the dl_cc monotonic fixpoint
  * (Test scope, never shipped). */
object ScratchCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.datalog.recursion.collectstats", "true")
    import org.apache.spark.sql.functions.col
    val cust = Tables.load(spark, sfDir, "customer")
    val t0 = System.nanoTime()
    val c = new graft.datalog.DatalogContext(spark)
    c.loadProgram(
      "database({edge(X:long, Y:long), node(X:long)}). " +
        "cc3(X,mmin<X>) <- node(X). " +
        "cc3(Y,mmin<V>) <- cc3(X,V), edge(X,Y). " +
        "cc2(X,min<Y>) <- cc3(X,Y).")
    val B = 16
    val withMax = cust.selectExpr("c_custkey as k")
      .crossJoin(cust.selectExpr("max(c_custkey) as m"))
    val step = withMax.filter(col("k") % B =!= (B - 1) && col("k") + 1 <= col("m"))
      .select(col("k").as("x"), (col("k") + 1).as("y"))
    val back = withMax
      .filter(col("k") % B === (B - 1) &&
        org.apache.spark.sql.functions.expr(s"(k div $B) % 2 = 0"))
      .select(col("k").as("x"), (col("k") - (B - 1)).as("y"))
    val fwd = step.union(back)
    c.registerTable("edge",
      fwd.union(fwd.select(col("y").as("x"), col("x").as("y"))))
    c.registerTable("node", cust.selectExpr("c_custkey as x"))
    val n = c.query("cc2(A,B).").count()
    println(f"CC total: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    c.iterationStats.foreach { s => println(s"CC stat: $s") }
    c.close(); spark.stop()
  }
}
