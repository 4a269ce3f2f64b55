package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Throwaway (Test scope, never shipped): phase decomposition of the
  * REAL dl_tc_incremental gate (VERDICT r18 #4 / What's-wrong #3: the
  * sf10 wall is 2.7× the from-scratch closure and has never been
  * split). Runs the gate's exact program piecewise on the same engine
  * paths (localiterate forced, like the gate) and times each stratum:
  * arcold/arcnew split, the tcold closure, the delta clique d, and the
  * final tcinc union+distinct.
  *
  *   sbt "Test/runMain graft.ScratchInc10 <sfDir> [conf=val ...] [stages]"
  */
object ScratchInc10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.datalog.recursion.collectstats", "true")
    spark.conf.set("spark.datalog.recursion.localiterate", "true")
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    if (args.contains("stages"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val ms = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(-1L)
            println(s"INC10 stage ${i.stageId} ${ms}ms tasks=${i.numTasks} " +
              s"in=${i.taskMetrics.inputMetrics.recordsRead} " +
              s"sr=${i.taskMetrics.shuffleReadMetrics.recordsRead} " +
              s"sw=${i.taskMetrics.shuffleWriteMetrics.recordsWritten} " +
              s"exec=${i.taskMetrics.executorRunTime}ms " +
              s"[${i.name.takeWhile(_ != '\n').take(50)}]")
          }
        })
    // gate-identical arc (DatalogQueries.arcDF is private[queries])
    val arc = {
      import org.apache.spark.sql.functions.{broadcast, lit, max}
      val B = 16
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
      step.union(skip)
    }

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"INC10 $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val c = new graft.datalog.DatalogContext(spark)
    c.loadProgram(
      "database({arc(X:long, Y:long, C:long)}). " +
        "arcold(X,Y) <- arc(X,Y,C), C < 3. " +
        "arcold(X,Y) <- arc(X,Y,C), C >= 3, X >= 1000. " +
        "arcnew(X,Y) <- arc(X,Y,C), C >= 3, X < 1000. " +
        "tcold(X,Y) <- arcold(X,Y). " +
        "tcold(X,Z) <- tcold(X,Y), arcold(Y,Z). " +
        "d(X,Y) <- arcnew(X,Y). " +
        "d(X,Z) <- tcold(X,Y), arcnew(Y,Z). " +
        "d(X,Z) <- d(X,Y), arcnew(Y,Z). " +
        "d(X,Z) <- d(X,Y), tcold(Y,Z). " +
        "tcinc(X,Y) <- tcold(X,Y). tcinc(X,Y) <- d(X,Y).")
    c.registerTable("arc", arc)
    val t0 = System.nanoTime()
    phase("arcold") { c.query("arcold(A,B).").count() }
    phase("arcnew") { c.query("arcnew(A,B).").count() }
    val nOld = phase("tcold closure") { c.query("tcold(A,B).").count() }
    val nD = phase("delta clique d") { c.query("d(A,B).").count() }
    val n = phase("tcinc union+distinct") { c.query("tcinc(A,B).").count() }
    println(f"INC10 total: ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"tcold=$nOld d=$nD tcinc=$n")
    c.iterationStats.foreach { s => println(s"INC10 stat: $s") }
    c.close(); spark.stop()
  }
}
