package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import graft.datalog.DatalogContext

/** Ad-hoc: per-iteration wall-time profile of the bound (magic-set)
  * fixpoint — where do dl_tc_bound's seconds go? */
object BoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.datalog.recursion.collectstats", "true")
    // warmup
    SparkEntry.queries("dl_reach")(spark, sfDir).count()
    SparkEntry.release()
    for (round <- 1 to 2) {
      val c = new DatalogContext(spark)
      c.loadProgram("database({arc(X:long, Y:long, C:long)}). " +
        "tc(A,B) <- arc(A,B,_). tc(A,B) <- tc(A,C), tc(C,B).")
      c.registerTable("arc", DatalogQueries.arcDF(spark, sfDir))
      val t0 = System.nanoTime()
      val n = c.query("tc(0,B).").count()
      val dt = (System.nanoTime() - t0) / 1e9
      val stats = c.iterationStats
      println(f"ROUND $round rows=$n time=$dt%.2fs iters=${stats.size} " +
        f"iterMs=${stats.map(_._4).sum} " +
        s"perIter=${stats.map(t => s"${t._1.take(9)}#${t._2}:${t._3}r/${t._4}ms").mkString(" ")}")
      c.close()
    }
    spark.stop()
  }
}
