package graft
import org.apache.spark.sql.SparkSession

/** Cheap box-health sample: runs only the fixed-work calibration probes
  * and prints one JSON line. Used to pick a clean window for baseline
  * re-commits without paying a full bench run — the relative write
  * prong (judge r14 #1) refuses any run whose probes exceed 1.15x the
  * committed file's own, so launching a ~10-minute bench on a box
  * reading over that line is a guaranteed refusal.
  */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val samples = (1 to n).map(_ => Bench.fixedWorkProbes(spark))
    val js = samples.map { case (p, pst) =>
      f"""{"probe_seconds":$p%.3f,"probe_st_seconds":$pst%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"probe_check","samples":$js}""")
    spark.stop()
  }
}
