package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col, lit, max}

/** Throwaway (Test scope, never shipped): iteration-vs-wall profile of
  * the scale-sized support-aggregate gates (dl_paths_msum_all /
  * dl_indeg_mcount_roots — Θ(N) support state, VERDICT r18 #2) on the
  * gate-identical programs, with per-iteration stats.
  *
  *   sbt "Test/runMain graft.ScratchSup10 <sfDir> [conf=val ...]"
  */
object ScratchSup10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf10")
    val B = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.datalog.recursion.collectstats", "true")
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    val keys = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"))
    val mx = keys.agg(max("k").as("m"))
    val withMax = keys.crossJoin(broadcast(mx))
    val step = withMax
      .filter(col("k") % B =!= (B - 1) && col("k") + 1 <= col("m"))
      .select(col("k").as("x"), (col("k") + 1).as("y"), lit(2L).as("c"))
    val skip = withMax
      .filter(col("k") % B <= (B - 4) && col("k") + 3 <= col("m"))
      .select(col("k").as("x"), (col("k") + 3).as("y"), lit(5L).as("c"))
    val arc = step.union(skip)
    val nodes = keys.select(col("k").as("x"))

    def run(tag: String, prog: String, q: String): Unit = {
      val t0 = System.nanoTime()
      val c = new graft.datalog.DatalogContext(spark)
      c.loadProgram("database({arc(X:long, Y:long, C:long), node(X:long), " +
        "root(X:long)}). " + prog)
      c.registerTable("arc", arc)
      c.registerTable("node", nodes)
      c.registerTable("root", nodes.filter(col("x") % B === 0))
      val n = c.query(q).count()
      println(f"SUP10 $tag total: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
      c.iterationStats.foreach { s => println(s"SUP10 $tag stat: $s") }
      c.close()
    }
    run("msum_all",
      "cpa(X, msum<(S, C)>) <- node(X), S= -1, C=1. " +
        "cpa(Y, msum<(X, C)>) <- cpa(X, C), arc(X, Y, _).",
      "cpa(N, C).")
    run("mcount_roots",
      "nbr(X, mcount<S>) <- root(X), S= -1. " +
        "nbr(Y, mcount<X>) <- nbr(X, _), arc(X, Y, _).",
      "nbr(N, C).")
    spark.stop()
  }
}
