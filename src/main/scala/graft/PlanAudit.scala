package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * scale checklist: filters/column pruning reach the parquet scan
  * (PushedFilters / ReadSchema), dimension joins broadcast, hot paths
  * stay inside WholeStageCodegen spans. Run:
  * `sbt "runMain graft.PlanAudit q2_filter_project q3_join_agg"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q2_filter_project", "q3_join_agg", "q8_topk", "txt_lsh_pairs",
        "emb_knn")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
