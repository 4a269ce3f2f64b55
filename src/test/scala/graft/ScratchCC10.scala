package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Throwaway (Test scope, never shipped): iteration-vs-wall profile of
  * the REAL dl_cc gate graph at an arbitrary fixture (judge r16 #4 —
  * split scheduling overhead from propagation depth at sf10). Unlike
  * ScratchCC's synthetic 32-node-component chain, this replicates the
  * gate's own graph (DatalogQueries.arcSql: +1 chain within 16-key
  * blocks + +3 skips, symmetric closure), so iteration counts and
  * per-iteration walls are the committed gate's own decomposition.
  */
object ScratchCC10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf10")
    val B = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.datalog.recursion.collectstats", "true")
    val cust = Tables.load(spark, sfDir, "customer")
    val t0 = System.nanoTime()
    val c = new graft.datalog.DatalogContext(spark)
    c.loadProgram(
      "database({edge(X:long, Y:long), node(X:long)}). " +
        "cc3(X,mmin<X>) <- node(X). " +
        "cc3(Y,mmin<V>) <- cc3(X,V), edge(X,Y). " +
        "cc2(X,min<Y>) <- cc3(X,Y).")
    val withMax = cust.selectExpr("c_custkey as k")
      .crossJoin(cust.selectExpr("max(c_custkey) as m"))
    val step = withMax
      .filter(col("k") % B =!= (B - 1) && col("k") + 1 <= col("m"))
      .select(col("k").as("x"), (col("k") + 1).as("y"))
    val skip = withMax
      .filter(col("k") % B <= (B - 4) && col("k") + 3 <= col("m"))
      .select(col("k").as("x"), (col("k") + 3).as("y"))
    val fwd = step.union(skip)
    c.registerTable("edge",
      fwd.union(fwd.select(col("y").as("x"), col("x").as("y"))))
    c.registerTable("node", cust.selectExpr("c_custkey as x"))
    val n = c.query("cc2(A,B).").count()
    println(f"CC10 total: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n sf=$sfDir")
    c.iterationStats.foreach { s => println(s"CC10 stat: $s") }
    c.close(); spark.stop()
  }
}
