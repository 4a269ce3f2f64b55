package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Ad-hoc: count Spark jobs/stages a query schedules (warm, 2nd run). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val sites = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val d = j.stageInfos.headOption.map(_.name.takeWhile(_ != '(')).getOrElse("?")
        sites.computeIfAbsent(d, _ => new AtomicInteger).incrementAndGet()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    SparkEntry.queries("dl_reach")(spark, sfDir).count()
    SparkEntry.release()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).count()
      SparkEntry.release()
      jobs.set(0); stages.set(0); sites.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val top = sites.asScala.toSeq.sortBy(-_._2.get).take(8)
        .map { case (k, v) => s"$k=${v.get}" }.mkString(" ")
      println(f"JOBS $name time=$dt%.2fs jobs=${jobs.get} stages=${stages.get} :: $top")
      SparkEntry.release()
    }
    spark.stop()
  }
}
