package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Invariant checks for the pipeline query packs at sf0.001 — the DuckDB
  * oracle gate is the authoritative value check (tools/check_oracle.py);
  * these specs assert structural properties cheaply in-JVM, plus
  * cross-paradigm consistency (streaming vs batch, LSH vs blocked
  * exact). */
class QueryPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("oracle keys cover every query (weaker rows-only check avoided)") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
  }

  test("txt_tfidf_top: vocabulary join is size-guarded, never force-broadcast") {
    import org.apache.spark.sql.GraftColumnBridge
    // huge-vocabulary regime (simulated by disabling the size threshold):
    // the plan must fall back to a term-partitioned shuffle join — a
    // force-broadcast hint here would hit the 8 GB cliff at 100 TB
    val s1 = spark.newSession()
    s1.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val big = graft.queries.TextQueries.defs("txt_tfidf_top")(s1, dir)
    assert(big.count() > 0)
    assert(!GraftColumnBridge.executedPlanString(big).contains("BroadcastHashJoin"),
      "vocabulary side was broadcast even above the size cap")
    // small-vocabulary regime: size-based planning (AQE sees the runtime
    // size of the aggregated df side) picks the broadcast join on its own
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    val small = graft.queries.TextQueries.defs("txt_tfidf_top")(s2, dir)
    assert(small.count() > 0)
    assert(GraftColumnBridge.executedPlanString(small).contains("BroadcastHashJoin"),
      "small vocabulary should be auto-broadcast by size")
  }

  test("txt_dedup_exact: doubled corpus dedups to exactly 2 copies each") {
    val rows = run("txt_dedup_exact").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
    assert(rows.forall(_.getAs[Long]("canonical_id") < 1000000L))
  }

  test("txt_lsh_pairs: verified pairs satisfy the Jaccard threshold") {
    val rows = run("txt_lsh_pairs").collect()
    assert(rows.nonEmpty, "LSH found no near-dup pairs")
    assert(rows.forall(r =>
      2 * r.getAs[Long]("n_inter") >= r.getAs[Long]("n_union")))
  }

  test("txt_lsh_pairs ⊆ txt_ngram_jaccard at a looser threshold") {
    // every LSH-confirmed pair (J ≥ 0.5) must also be found by the
    // blocked exact-Jaccard pass (J ≥ 0.3) — cross-method consistency
    val lsh = run("txt_lsh_pairs").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ng = run("txt_ngram_jaccard").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(ng), s"LSH pairs missing from exact pass: ${lsh -- ng}")
  }

  test("txt_neardup_groups: canonical ids are component minima covering every pair") {
    val groups = run("txt_neardup_groups").collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("g")).toMap
    assert(groups.nonEmpty)
    // canonical id never exceeds the member id, and is itself a member
    // mapping to itself
    groups.foreach { case (d, g) => assert(g <= d && groups(g) == g) }
    // both endpoints of every verified near-dup pair share a group
    run("txt_lsh_pairs").collect().foreach { r =>
      assert(groups(r.getAs[Long]("d1")) == groups(r.getAs[Long]("d2")))
    }
  }

  test("txt_tfidf_top: exactly <=3 ranked terms per doc, scores non-increasing") {
    val rows = run("txt_tfidf_top").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk"), r.getAs[Long]("score")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3 && rs.map(_._2).sorted.sameElements(1L to rs.length))
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("emb_ivf_assign: every vector gets exactly one centroid") {
    val rows = run("emb_ivf_assign").collect()
    val n = graft.Tables.load(spark, dir, "embeddings").count()
    assert(rows.length.toLong == n)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
  }

  test("stream_sessions (session_window) matches the batch lag formulation") {
    val streamed = run("stream_sessions").selectExpr(
      "user_id", "session_start", "n_events")
    graft.Tables.load(spark, dir, "events").createOrReplaceTempView("__events_tmp")
    val batch = spark.sql(
      """WITH e AS (SELECT user_id, ts div 1000 AS tsu FROM __events_tmp),
         s AS (SELECT user_id, tsu,
                 CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) > 3600000000
                      THEN 1 ELSE 0 END AS brk FROM e),
         g AS (SELECT user_id, tsu,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
                                ROWS UNBOUNDED PRECEDING) AS sid FROM s)
         SELECT user_id, CAST(min(tsu) AS BIGINT) AS session_start,
                count(*) AS n_events
         FROM g GROUP BY user_id, sid""")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("emb_knn: exactly 10 ranked neighbors per query, dot non-increasing") {
    val rows = run("emb_knn").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk"), r.getAs[Long]("dot")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("emb_knn_lsh results are a subset of brute-force candidates' scores") {
    val brute = run("emb_knn").collect()
      .map(r => ((r.getAs[Long]("qid"), r.getAs[Long]("cid")), r.getAs[Long]("dot"))).toMap
    val lsh = run("emb_knn_lsh").collect()
    // any LSH hit that brute-force also ranked must agree on the score
    lsh.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
      brute.get(k).foreach(d => assert(d == r.getAs[Long]("dot")))
    }
  }

  test("stream_hourly (Structured Streaming) equals the batch aggregation") {
    val streamed = run("stream_hourly")
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(expr("(ts div 3600000000000) * 3600").as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("sum_value_cents"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream_join (stream-stream interval join) equals the batch range join") {
    val streamed = run("stream_join")
    val e = graft.Tables.load(spark, dir, "events")
      .selectExpr("event_id", "user_id", "ts div 1000 as tsu", "event_type")
    val p = e.filter("event_type = 'purchase'")
      .selectExpr("event_id as pid", "user_id", "tsu as ptsu")
    val c = e.filter("event_type = 'click'")
      .selectExpr("event_id as cid", "user_id as cu", "tsu as ctsu")
    val batch = p.join(c, expr(
        "user_id = cu and ctsu between ptsu - 3600000000 and ptsu"))
      .selectExpr("pid", "cid", "user_id", "ptsu - ctsu as gap_us")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("evt_sessions: session counts bounded by event counts") {
    val rows = run("evt_sessions").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val n = r.getAs[Long]("n_events")
      assert(s >= 1L && s <= n)
    }
  }

  test("mm_features: byte length matches text length (ASCII corpus)") {
    val joined = run("mm_features")
      .join(graft.Tables.load(spark, dir, "documents"), "doc_id")
      .selectExpr("n_bytes", "length(text) as l", "n_frames")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bytes") == r.getAs[Int]("l").toLong)
      assert(r.getAs[Long]("n_frames") == r.getAs[Long]("n_bytes") / 1000 + 1)
    }
  }

  test("txt_rep_ratio: permilles in range, max frequency consistent with counts") {
    val rows = run("txt_rep_ratio").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens"); val d = r.getAs[Int]("n_distinct")
      val mf = r.getAs[Long]("max_tok_freq")
      assert(d >= 1 && d <= n)
      assert(r.getAs[Long]("dup_permille") == (n - d).toLong * 1000 / n)
      // the most frequent token accounts for at least the mean share and
      // at most every duplicate-plus-one
      assert(mf >= (n + d - 1) / d && mf <= n - d + 1)
      assert(r.getAs[Long]("top_share_permille") == mf * 1000 / n)
    }
  }

  test("txt_top_ngrams: 20 bigrams, counts non-increasing, agree with explode") {
    val rows = run("txt_top_ngrams").collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("n")))
    assert(rows.length == 20)
    // gate preserves its own sort order; counts must be non-increasing
    assert(rows.map(_._2).zip(rows.map(_._2).tail).forall { case (a, b) => a >= b })
    // recount the top bigram independently
    val (top, n) = rows.head
    val Array(w1, w2) = top.split(" ", 2).padTo(2, "")
    val recount = graft.Tables.load(spark, dir, "documents")
      .selectExpr("split(text, ' ') as t")
      .selectExpr("size(filter(sequence(0, size(t) - 2)," +
        s" i -> t[i] = '$w1' and t[i+1] = '$w2')) as c")
      .agg(sum("c")).head.getLong(0)
    assert(recount == n)
  }

  test("txt_dedup_incr: survivors are odd ids with no verified old-corpus partner") {
    val kept = run("txt_dedup_incr").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.nonEmpty)
    assert(kept.forall(_ % 2 == 1))
    val pairs = run("txt_lsh_pairs").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.collect {
      case (o, n) if o % 2 == 0 && n % 2 == 1 => n
      case (n, o) if o % 2 == 0 && n % 2 == 1 => n
    }.toSet
    assert(kept.intersect(dropped).isEmpty)
    val odd = graft.Tables.load(spark, dir, "documents")
      .filter(expr("doc_id % 2 = 1")).count()
    assert(kept.size + dropped.size >= odd.toInt &&
      kept.size <= odd.toInt)
  }

  test("txt_pack_sequences: offsets stay inside the chunks, shards consistent") {
    val rows = run("txt_pack_sequences").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shard, seqId, off) =
        (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off"))
      assert(off >= 0 && off < 512, s"offset $off outside chunk")
      assert(seqId / 1000000 == shard, s"seq $seqId not in shard $shard")
    }
    // exact layout: within a shard, each doc's absolute token position
    // (seq_id − base)·512 + seq_off equals the running sum of the
    // preceding docs' token counts — holds regardless of doc length
    // (a ≥513-token doc legitimately SPANS sequence ids, so a naive
    // contiguity-of-reported-ids check would be wrong)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(r =>
        (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
      var cum = 0L
      for (r <- ordered) {
        val pos = (r.getAs[Long]("seq_id") - shard * 1000000) * 512 +
          r.getAs[Long]("seq_off")
        assert(pos == cum,
          s"shard $shard doc ${r.getAs[Long]("doc_id")} at $pos, expected $cum")
        cum += r.getAs[Number]("n_tokens").longValue
      }
    }
  }

  test("txt_kmv_distinct: sketch brackets the exact distinct count") {
    val rows = run("txt_kmv_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kUsed, exact, est) = (r.getAs[Long]("k_used"),
        r.getAs[Long]("exact_distinct"), r.getAs[Long]("est_distinct"))
      assert(kUsed <= 64)
      if (kUsed < 64) assert(est == exact, s"sub-k estimate must be exact")
      else assert(est >= exact / 2 && est <= exact * 2,
        s"KMV estimate $est implausible vs exact $exact (k=64 err ~12.5%)")
    }
  }

  test("txt_decontam: reports only training docs, never the benchmark split") {
    val rows = run("txt_decontam").collect()
    assert(rows.nonEmpty, "synthetic corpus should show some contamination")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 != 7, "benchmark doc reported")
      assert(r.getAs[Long]("n_hits") > 0)
    }
  }

  test("emb_sq8: reconstruction error bounded by the quantization step") {
    val rows = run("emb_sq8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, err) = (r.getAs[Long]("m"), r.getAs[Long]("l1_err"))
      // per component |x - dequant(x)| < m/127 + 1 → L1 over 64 dims
      assert(err >= 0 && err <= 64 * (m / 127 + 1),
        s"l1_err $err exceeds the quantization bound for scale $m")
    }
  }

  test("graph fixpoints: copart (cluster) path matches the broadcast path") {
    for (q <- Seq("graph_pagerank_conv", "graph_kcore")) {
      def rows(s: org.apache.spark.sql.SparkSession) =
        graft.queries.GraphQueries.defs(q)(s, dir)
          .collect()
          .map(r => (r.get(0).asInstanceOf[Number].longValue,
            r.get(1).asInstanceOf[Number].longValue)).toSet
      val base = rows(spark.newSession())
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.graph.copartition", "true")
      val cop = rows(s2)
      assert(cop == base,
        s"copart $q diverged: ${(cop diff base).take(3)} vs ${(base diff cop).take(3)}")
      assert(base.nonEmpty)
    }
    PackResources.releaseAll()
  }

  test("dl_tc: closure contains the arc base and is transitively closed (sample)") {
    val tc = run("dl_tc").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // base edges k -> k+1 within a block must be present
    assert(tc.contains((0L, 1L)) && tc.contains((1L, 2L)))
    // block-local: no pair crosses a 16-block boundary
    assert(tc.forall { case (a, b) => a / 16 == b / 16 })
    // transitivity spot-check inside block 0
    for ((a, b) <- tc if a < 16 && b < 15; if tc.contains((b, b + 1)))
      assert(tc.contains((a, b + 1)))
  }
}
