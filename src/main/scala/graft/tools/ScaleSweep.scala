package graft.tools

import org.apache.spark.sql.SparkSession

/** One-decade scale-up evidence run (SURVEY 7f): times the heaviest
  * gates against a scaled testdata dir (see tools/gen_scale.py) after
  * the same machinery warmup the bench uses, printing one line per
  * query. Correctness at the same scale comes from graft.Verify +
  * tools/check_oracle.py on the same dir — this main is timing only.
  *
  * run: sbt "runMain graft.tools.ScaleSweep /root/repo/target/scratch/tmp_sf1 [q1,q2,...]"
  */
object ScaleSweep {
  private val heavy = Seq(
    "dl_tc", "dl_tc_nl", "dl_sg", "dl_apsp", "dl_tc_diffflip",
    "dl_tc_bloom", "dl_tc_localiter", "dl_apsp_localiter", "dl_sssp",
    "dl_cc", "txt_minhash", "txt_lsh_pairs", "txt_neardup_groups",
    "txt_dedup_exact", "txt_pack_sequences", "emb_knn", "emb_knn_lsh",
    "emb_ivfpq_search", "emb_ivfpq_bucketed", "emb_neardup",
    "graph_pagerank", "graph_pagerank_conv", "graph_kcore", "graph_lpa",
    "stream_hourly", "stream_sessions", "stream_join", "q1_agg",
    "q3_join_agg", "q31_salted_join", "txt_span_dedup", "evt_scd2",
    "txt_chunk_overlap", "txt_inverted_index", "evt_retention",
    "q33_bloom_join", "q34_grouping_sets", "txt_heavy_hitters_cms",
    "txt_sample_weighted", "emb_rproj", "evt_quantiles_hist",
    "dl_scc", "emb_ivfpq_rerank", "stream_topk", "txt_pii_redact")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val queries = args.lift(1).map(_.split(',').toSeq).getOrElse(heavy)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup families as the bench: tiny-scale gates absorb the
    // first-of-kind JIT so sweep numbers compare plans, not positions
    val warmDir = "/root/testdata/sf0.001"
    Seq("dl_tc", "dl_tc_bloom", "dl_sssp_localiter", "dl_apsp",
      "stream_hourly", "stream_join", "graph_pagerank_conv",
      "emb_ivfpq_search").foreach { q =>
      try graft.SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    graft.queries.PackResources.releaseAll()
    val results = queries.map { q =>
      val t0 = System.nanoTime()
      val n =
        try graft.SparkEntry.queries(q)(spark, sfDir).count()
        catch { case e: Throwable =>
          println(s"SWEEP $q ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
          -1L
        }
      val t = (System.nanoTime() - t0) / 1e9
      println(f"SWEEP $q rows=$n t=$t%.2f")
      q -> t
    }
    println(f"SWEEP_TOTAL ${results.map(_._2).sum}%.1f sec over ${results.size} queries")
    graft.SparkEntry.release()
    spark.stop()
  }
}
