package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Structural invariants for the r11 pipeline additions — chunking,
  * inverted index, retention — checked against the raw fixture tables
  * (independent of the DuckDB oracle formulations, which mirror the
  * engine's own arithmetic):
  *
  *  - txt_chunk_overlap: chunk 0 + the tails of every later chunk
  *    reconstruct the document exactly (the overlap really is the
  *    stride prefix, no token lost or duplicated); per-doc chunk count
  *    = ceil(n/48); every chunk's token count matches its text.
  *  - txt_inverted_index: per doc, sum(tf) = token count and
  *    max(position) = token count (1-based, dense); per (term, doc),
  *    the positions string is strictly increasing and its length = tf.
  *  - evt_retention: offset-0 row per cohort counts the whole cohort
  *    (every user is active in their own first week); summing the
  *    offset-0 counts = total distinct users; no negative offsets.
  */
class ChunkIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("chunks on a 48-stride reconstruct every document exactly") {
    import spark.implicits._
    val chunks = TextQueries.defs("txt_chunk_overlap")(spark, dir)
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)]
      .collect().groupBy(_._1)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val toks = docs(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      // chunk ids dense from 0, starts on the stride, count = ceil(n/48)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.length == (toks.length + 47) / 48)
      sorted.foreach { case (_, k, start, n, text) =>
        assert(start == k * 48)
        val expect = toks.slice(start.toInt, start.toInt + 64)
        assert(n == expect.length && n == math.min(64, toks.length - start))
        assert(text == expect.mkString(" "))
      }
      // stitch: chunk 0 plus tokens [48,64) of each later chunk = doc
      val stitched = sorted.flatMap { case (_, k, _, _, text) =>
        val ts = text.split(" ", -1)
        if (k == 0) ts else ts.drop(16)
      }
      assert(stitched.toSeq == toks.toSeq)
    }
  }

  test("inverted index is a dense 1-based permutation of each document") {
    import spark.implicits._
    val idx = TextQueries.defs("txt_inverted_index")(spark, dir)
      .select("term", "doc_id", "tf", "first_pos", "positions")
      .as[(String, Long, Long, Long, String)].collect()
    val nTok = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) as n")
      .as[(Long, Long)].collect().toMap
    idx.groupBy(_._2).foreach { case (id, rows) =>
      assert(rows.map(_._3).sum == nTok(id), s"sum(tf) != n_tokens for $id")
      val allPos = rows.flatMap(_._5.split(",").map(_.toLong))
      assert(allPos.sorted.toSeq == (1L to nTok(id)).toSeq,
        s"positions not a dense 1..n permutation for $id")
    }
    idx.foreach { case (term, id, tf, first, pos) =>
      val ps = pos.split(",").map(_.toLong).toSeq
      assert(ps.length == tf && ps == ps.sorted && ps.head == first,
        s"posting list malformed for ($term, $id)")
    }
  }

  test("count-min estimates never undercount (the CMS bound)") {
    import spark.implicits._
    val r = TextQueries.defs("txt_heavy_hitters_cms")(spark, dir)
      .select("token", "exact_n", "cms_est")
      .as[(String, Long, Long)].collect()
    assert(r.length == 10, s"expected the exact top-10, got ${r.length}")
    assert(r.forall(t => t._3 >= t._2),
      "CMS underestimated a heavy hitter — the sketch bound is one-sided")
    // the exact top-10 counts must match a direct recount
    val recount = graft.Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) as t")
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(r.forall(t => recount(t._1) == t._2))
  }

  test("weighted sampling over-represents heavy docs deterministically") {
    import spark.implicits._
    // sf0.1 (5000 docs): the 1000-doc sample must be a strict subset
    // for the bias to be observable (sf0.001 AND sf0.01 both carry
    // only 500 docs — there the sample IS the corpus and the means
    // coincide)
    val wDir = "/root/testdata/sf0.1"
    val sample = TextQueries.defs("txt_sample_weighted")(spark, wDir)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect()
    val corpus = graft.Tables.load(spark, wDir, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) as n")
      .as[(Long, Long)].collect()
    assert(sample.length == math.min(1000, corpus.length))
    // token-proportional draw: the sample's mean doc length must
    // exceed the corpus mean (heavier docs draw smaller keys)
    val sMean = sample.map(_._2).sum.toDouble / sample.length
    val cMean = corpus.map(_._2).sum.toDouble / corpus.length
    assert(sMean > cMean,
      f"no weighting bias: sample mean $sMean%.1f vs corpus $cMean%.1f")
    // deterministic: a second evaluation draws the identical sample
    val again = TextQueries.defs("txt_sample_weighted")(spark, wDir)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect()
    assert(sample.toSeq == again.toSeq)
  }

  test("histogram quantiles bracket the exact percentiles") {
    import spark.implicits._
    val est = TemporalQueries.defs("evt_quantiles_hist")(spark, dir)
      .select("p", "est_cents").as[(Long, Long)].collect().toMap
    assert(est.keySet == Set(50L, 90L, 99L))
    val cents = graft.Tables.load(spark, dir, "events")
      .selectExpr("cast(round(value * 100, 0) as bigint) as c")
      .as[Long].collect().sorted
    val width = (cents.last - cents.head + 1) / 1000 + 1
    est.foreach { case (p, e) =>
      // exact kth smallest, k = ceil(p·n/100) — the estimate is the
      // containing bucket's lower bound, so exact ∈ [est, est + width)
      val exact = cents(((p * cents.length + 99) / 100 - 1).toInt)
      assert(e <= exact && exact < e + width,
        s"p$p estimate $e does not bracket exact $exact (width $width)")
    }
  }

  test("z-order buckets give multi-dimensional pruning on either axis") {
    import spark.implicits._
    val z = RelationalQueries.defs("q35_zorder")(spark, "/root/testdata/sf0.1")
      .select("x", "y", "z", "z_bucket").as[(Long, Long, Long, Long)].collect()
    // interleave round-trip: de-interleaving z recovers (x, y) exactly
    z.take(500).foreach { case (x, y, zv, _) =>
      var (dx, dy) = (0L, 0L)
      (0 until 16).foreach { i =>
        dx |= ((zv >> (2 * i)) & 1) << i
        dy |= ((zv >> (2 * i + 1)) & 1) << i
      }
      assert(dx == x && dy == y, s"z=$zv does not round-trip ($x, $y)")
    }
    // locality: a narrow filter on EITHER dimension touches a small
    // fraction of the z-range buckets — the pruning a zordered layout
    // buys at 100 TB (each bucket = one file/range a scan can skip)
    val all = z.map(_._4).distinct.length
    val xs = z.filter(t => t._1 >= 1000 && t._1 < 1256).map(_._4).distinct.length
    val ys = z.filter(t => t._2 >= 1000 && t._2 < 1256).map(_._4).distinct.length
    assert(xs < all / 2 && ys < all / 2,
      s"no z-locality: $xs/$ys of $all buckets for 256-wide slices")
  }

  test("retention cohorts: offset 0 covers each cohort; totals add up") {
    import spark.implicits._
    val r = TemporalQueries.defs("evt_retention")(spark, dir)
      .select("cohort_wk", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect()
    assert(r.forall(_._2 >= 0), "negative week offset")
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    val offset0 = r.filter(_._2 == 0)
    assert(offset0.map(_._1).distinct.length ==
      r.map(_._1).distinct.length, "a cohort lacks its offset-0 row")
    assert(offset0.map(_._3).sum == users,
      "offset-0 cohort sizes do not sum to the distinct-user count")
    // no later offset can exceed its cohort's size
    val size = offset0.map(t => t._1 -> t._3).toMap
    assert(r.forall(t => t._3 <= size(t._1)), "retention above cohort size")
  }
}
