package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe for the dl_scc cost profile (Test scope). */
object ScratchSCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(sum("v")).count()
    val confs = args.filter(_.contains("="))
    confs.foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCC $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    import graft.datalog.DatalogContext
    val db = "database({arc(X:long, Y:long, C:long), " +
      "sarc(X:long, Y:long), node(X:long)})."
    def ctx(program: String): DatalogContext = {
      val c = new DatalogContext(spark)
      c.loadProgram(db + program)
      c.registerTable("sarc", DatalogQueries.sarcDF(spark, sfDir))
      c.registerTable("node",
        graft.Tables.load(spark, sfDir, "customer").select(col("c_custkey").as("x")))
      c
    }

    for (rep <- 1 to 2) {
      time(s"stc-only rep$rep") {
        ctx("stc(A,B) <- sarc(A,B). stc(A,B) <- stc(A,C), sarc(C,B).")
          .query("stc(A,B).").count()
      }
      PackResources.releaseAll()
      time(s"full-sccid rep$rep") {
        ctx("stc(A,B) <- sarc(A,B). stc(A,B) <- stc(A,C), sarc(C,B). " +
          "mut(A,B) <- stc(A,B), stc(B,A). " +
          "mut(A,B) <- node(A), B=A. " +
          "sccid(A,min<B>) <- mut(A,B).")
          .query("sccid(A,B).").count()
      }
      PackResources.releaseAll()
    }
    spark.stop()
  }
}
