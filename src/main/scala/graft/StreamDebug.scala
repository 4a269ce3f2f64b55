package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc: dump per-batch StreamingQueryProgress for one streaming gate. */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // trailing key=value args become session confs (e.g.
    // spark.graft.stream.stateStore=rocksdb for the backend A/B)
    val (confs, names) = args.tail.partition(_.contains("="))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.map(o =>
          s"${o.operatorName}: total=${o.numRowsTotal} upd=${o.numRowsUpdated} " +
          s"removed=${o.numRowsRemoved} lateDropped=${o.numRowsDroppedByWatermark} " +
          s"memBytes=${o.memoryUsedBytes} " +
          s"updMs=${o.allUpdatesTimeMs} rmMs=${o.allRemovalsTimeMs} commitMs=${o.commitTimeMs}")
          .mkString(" | ")
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"dur=${p.durationMs.get("triggerExecution")}ms " +
          s"(addBatch=${p.durationMs.get("addBatch")} getBatch=${p.durationMs.get("getBatch")} " +
          s"commit=${p.durationMs.get("commitOffsets")} walCommit=${p.durationMs.get("walCommit")}) " +
          s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} :: $st")
      }
    }
    spark.streams.addListener(listener)
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"RESULT $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.queries.StreamingQueries.stateRowsByQuery.get(name).foreach(v =>
        println(s"STATE_ROWS $name ${v.mkString(",")}"))
      graft.queries.StreamingQueries.stateBytesByQuery.get(name).foreach(v =>
        println(s"STATE_BYTES $name ${v.mkString(",")}"))
      graft.queries.StreamingQueries.batchMillisByQuery.get(name).foreach(v =>
        println(s"BATCH_MS $name ${v.mkString(",")}"))
      graft.queries.StreamingQueries.watermarkByQuery.get(name).foreach(v =>
        v.zipWithIndex.foreach { case (l, i) => println(s"WM $name [$i] $l") })
    }
    spark.stop()
  }
}
