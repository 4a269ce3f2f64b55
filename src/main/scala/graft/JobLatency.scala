package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic: raw per-job scheduling latency on this machine — times N
  * trivial actions over a tiny cached DataFrame (what a fixpoint
  * iteration's convergence probe costs at minimum). */
object JobLatency {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).toDF("x").localCheckpoint()
    df.count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { df.count(); i += 1 }
      println(f"round $round: ${(System.nanoTime() - t0) / 1e9 / 50 * 1000}%.1f ms/job")
    }
    val t0 = System.nanoTime()
    var i = 0
    while (i < 20) {
      spark.range(100000).toDF("x").groupBy(expr("x % 97")).count().count(); i += 1
    }
    println(f"shuffle job: ${(System.nanoTime() - t0) / 1e9 / 20 * 1000}%.1f ms/job")
    spark.stop()
  }
  private def expr(s: String) = org.apache.spark.sql.functions.expr(s)
}
