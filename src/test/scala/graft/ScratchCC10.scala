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
    // r18 A/B hook: args(1) = fragmentstate (auto|true|false); the
    // driver-local path is pinned off so both arms run the looped paths
    spark.conf.set("spark.datalog.recursion.monotoniclocal", "false")
    args.lift(1).foreach(v =>
      spark.conf.set("spark.datalog.recursion.monotonic.fragmentstate", v))
    // args(2) = "plans": log per-iteration executed plans + exchange counts
    val logPlans = args.lift(2).contains("plans")
    if (logPlans) spark.conf.set("spark.datalog.recursion.logplans", "true")
    // args(2) = "noaqe": single-shot planning (stage-scheduling probe)
    if (args.lift(2).contains("noaqe"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    // args(2) = "stages": per-stage wall + task count + input/shuffle rows
    if (args.lift(2).contains("stages"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val ms = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(-1L)
            println(s"CC10 stage ${i.stageId} ${ms}ms tasks=${i.numTasks} " +
              s"in=${i.taskMetrics.inputMetrics.recordsRead} " +
              s"sr=${i.taskMetrics.shuffleReadMetrics.recordsRead} " +
              s"sw=${i.taskMetrics.shuffleWriteMetrics.recordsWritten} " +
              s"exec=${i.taskMetrics.executorRunTime}ms " +
              s"cpu=${i.taskMetrics.executorCpuTime / 1000000}ms " +
              s"[${i.name.takeWhile(_ != '\n').take(60)}]")
          }
        })
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
    if (logPlans) c.iterationPlanLog.foreach { case (p, i, x, plan) =>
      println(s"CC10 plan: $p iter=$i exchanges=$x\n$plan\n") }
    c.close(); spark.stop()
  }
}
