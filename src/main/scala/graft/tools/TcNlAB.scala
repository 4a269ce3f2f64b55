package graft.tools
import org.apache.spark.sql.SparkSession

/** Cold/warm decomposition of dl_tc_nl vs dl_tc at bench scale (judge
  * r11 #3): runs each twin twice from a cold-memo state in both orders
  * and prints the walls — the NL anti-join chain is real only if the
  * warm re-run stays high. */
object TcNlAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): Double = {
      graft.queries.PackResources.releaseAll()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // order A: nl first (the r11 artifact's implicit order question)
    Seq("dl_tc_nl", "dl_tc", "dl_tc_nl", "dl_tc", "dl_tc", "dl_tc_nl")
      .foreach(n => println(f"AB $n ${t(n)}%.2f"))
    graft.SparkEntry.release(); spark.stop()
  }
}
