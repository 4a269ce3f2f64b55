package graft

import org.apache.spark.sql.SparkSession

/** Throwaway A/B harness for iterating on single gates (Test scope,
  * never shipped): `sbt "Test/runMain graft.ScratchAB q1 q2 ..."`. */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    import org.apache.spark.sql.functions.sum
    spark.range(2000000).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(sum("v")).count()
    val (confs, names) = args.partition(_.contains("="))
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    for (name <- names; rep <- 1 to 2) {
      val snap = graft.queries.PackResources.snapshot()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"AB $name rep$rep: $t%.2fs rows=$n")
      graft.queries.StreamingQueries.batchMillisByQuery.get(name).foreach(b =>
        println(s"AB   batches(ms): ${b.mkString(",")}"))
      graft.queries.PackResources.releaseNewSince(snap)
    }
    spark.stop()
  }
}
