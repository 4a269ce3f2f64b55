package graft

import org.apache.spark.sql.SparkSession

/** Throwaway interleaved conf A/B harness (Test scope, never shipped):
  * runs ONE gate alternating base-conf and toggled-conf arms within a
  * single warm JVM, so the two arms share cache/JIT state and box
  * drift hits both equally (the r19 lesson: cold single-JVM A/Bs
  * read ±15% on this box).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchConfAB <query> <rounds> key=val ..."
  *
  * Prints one line per run: `CAB <query> <arm> round<i>: <sec>s rows=<n>`.
  */
object ScratchConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val rounds = args(1).toInt
    val confs = args.drop(2).filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    // SPARK_GRAFT_MASTER=local-cluster[2,16,8192] prices cluster-shape
    // questions (e.g. the staticclaims arm) under process-isolated
    // executors on this box; executors need the compiled classes on
    // their classpath (no app jar is shipped for a bare runMain)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      b.config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "8g"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.sum
    spark.range(2000000).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(sum("v")).count()
    // one untimed warm run absorbs first-of-family JIT/codegen surcharge
    locally {
      val snap = graft.queries.PackResources.snapshot()
      SparkEntry.queries(name)(spark, sfDir).count()
      graft.queries.PackResources.releaseNewSince(snap)
    }
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def setArm(on: Boolean): Unit =
      if (on) confs.foreach { case (k, v) => spark.conf.set(k, v) }
      else prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    val walls = scala.collection.mutable.Map[String, Vector[Double]]()
    for (r <- 1 to rounds; arm <- Seq("base", "conf")) {
      setArm(arm == "conf")
      val snap = graft.queries.PackResources.snapshot()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"CAB $name $arm round$r: $t%.2fs rows=$n")
      walls(arm) = walls.getOrElse(arm, Vector.empty) :+ t
      graft.queries.PackResources.releaseNewSince(snap)
    }
    setArm(false)
    walls.toSeq.sortBy(_._1).foreach { case (arm, ts) =>
      val s = ts.sorted
      println(f"CAB $name $arm: median=${s(s.size / 2)}%.2fs min=${s.head}%.2fs n=${s.size}")
    }
    spark.stop()
  }
}
