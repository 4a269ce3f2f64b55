package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-batch duration profile of the heavy streaming drains: rebuilds
  * the stream_join / stream_sessions plans against the staged replay
  * (via the gate, to share staging) and dumps every micro-batch's
  * durationMs breakdown from its own session's listener. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the streaming machinery once so per-batch numbers are JIT-clean
    graft.SparkEntry.queries("stream_hourly")(spark, sfDir).count()

    def profile(name: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"PROF $name rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"stateRows=${graft.queries.StreamingQueries.stateRowsByQuery.get(name)} " +
        s"batchMs=${graft.queries.StreamingQueries.batchMillisByQuery.get(name)}")
    }
    Seq("stream_join", "stream_sessions", "stream_join", "stream_sessions")
      .foreach(profile)
    graft.SparkEntry.release()
    spark.stop()
  }
}
