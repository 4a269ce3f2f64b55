package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: dump SparkEntry gates to parquet WITHOUT Verify's
  * `coalesce(1)` (whose single final task serializes everything above
  * the last exchange — fine for gate-scale outputs, pathological for
  * sf10 window gates like txt_span_dedup), plus the matching
  * oracle_sql.json subset. check_oracle.py globs every parquet part
  * file in the gate dir, so multi-file outputs compare identically.
  *
  *   sbt "runMain graft.tools.DumpGate <sfDir> <outDir> <gate>..."
  */
object DumpGate {
  def main(args: Array[String]): Unit = {
    // usage guard before destructuring (ADVICE r17 #2): fewer than 3
    // args previously threw an opaque MatchError / empty unknown-gates
    // message instead of the invocation hint
    require(args.length >= 3,
      "usage: runMain graft.tools.DumpGate <sfDir> <outDir> <gate>...")
    val Array(sfDir, outDir) = args.take(2)
    val names = args.drop(2).toSet
    val unknown = names -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown gate(s): ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          (cpus.toInt * 4).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.toSeq.sorted.foreach { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"[dump] $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => names(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.SparkEntry.release()
    spark.stop()
  }
}
