package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Scores are inner products over per-element quantized values
  * (floor(x·1000) as int64): integer arithmetic is order-independent and
  * engine-exact, so brute-force results hash-match the DuckDB oracle
  * bit-for-bit — float cosine would be summation-order-dependent.
  *
  * Scale design: brute-force top-k is the correctness baseline (a
  * broadcast of the query set against a scan of the corpus — at 100 TB
  * the corpus side stays partition-parallel and nothing shuffles but the
  * per-query top-k); the LSH variant buckets by random-hyperplane signs
  * so candidate generation joins on the bucket key instead of comparing
  * all pairs — that's the 100 TB path. Per-label centroids are the IVF
  * building block (one partial-aggregated shuffle keyed by label).
  */
object EmbeddingQueries extends QueryPack {

  /** int64-quantized embedding (float → double widen is exact);
    * exposed to the streaming ingest gate, which quantizes arriving
    * vectors with the identical expression. */
  private[queries] val quant =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1000.0) as bigint))"

  // dot products use the native codegen'd DotI64 expression — a tight
  // generated loop over the quantized arrays instead of interpreted
  // zip_with/aggregate lambdas (this is the per-pair inner kernel)
  import graft.functions.GraftFunctions.{dotI64, hyperplaneBucket}

  // Hyperplane-sign bucketing is the codegen'd HyperplaneBucket kernel
  // (graft.functions; plane weights ((i*31+j*17) % 7) - 3, bit-identical
  // to the aggregate(transform(...)) HOF the DuckDB oracles replicate —
  // the interpreted HOF was the dominant cost of every LSH query, and
  // joins on the bucket column evaluated it twice per corpus row via
  // the inlined isnotnull condition). Bits come from
  // `spark.graft.lsh.bits` (default 8): more bits → smaller buckets →
  // fewer candidates per bucket and lower recall — the knob a 100 TB
  // corpus turns UP so within-bucket work stays bounded as the corpus
  // grows. The same kernel at dims=16/bits=4 is the PQ subspace cell
  // hash.

  private def lshBits(s: SparkSession): Int =
    s.conf.get("spark.graft.lsh.bits", "8").toInt

  /** Multi-probe count (`spark.graft.lsh.probes`, default 1 = own
    * bucket only): a query probes its own bucket plus `probes-1`
    * single-bit-flip neighbor buckets — the standard recall knob that
    * trades a small, BOUNDED candidate growth (×probes, still
    * bucket-blocked) for the recall lost to raising `bits`. At 100 TB
    * the pairing is bits UP (smaller buckets) + probes UP (recover
    * recall); candidate volume stays ~corpus·probes/2^bits and the
    * plan stays a bucket-key join — never all-pairs. */
  private def lshProbes(s: SparkSession): Int =
    math.max(1, math.min(s.conf.get("spark.graft.lsh.probes", "1").toInt,
      lshBits(s) + 1))

  /** The probe set of `bkt`: itself + the first `probes-1` one-bit
    * flips (deterministic, so the oracle/spec can reproduce it). */
  private def probeArrayN(bkt: org.apache.spark.sql.Column, probes: Int) =
    array((bkt +: (0 until probes - 1)
      .map(j => bkt.bitwiseXOR(lit(1L << j)))): _*)

  private def probeArray(s: SparkSession, bkt: org.apache.spark.sql.Column) =
    probeArrayN(bkt, lshProbes(s))

  /** Per-bucket candidate cap (`spark.graft.lsh.maxBucketSize`, default
    * 100k = no-op at test scale): keeps the first `cap` vectors of each
    * bucket (deterministic by vec_id) before pair generation, so a
    * skewed hot bucket bounds at cap·(cap-1)/2 pairs instead of going
    * quadratic in the bucket population. Compiles to WindowGroupLimit —
    * the per-partition top-k runs below the bucket shuffle, and the
    * bucket hash partitioning is reused by the self-join, so the cap
    * adds no exchange. Past the cap the near-dup sweep is explicitly
    * approximate (the same contract as raising bits). */
  private def capBuckets(s: SparkSession, e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = s.conf.get("spark.graft.lsh.maxBucketSize", "100000").toInt
    val wb = Window.partitionBy("bkt").orderBy(asc("vec_id"))
    e.withColumn("brk", row_number().over(wb))
      .filter(col("brk") <= cap).drop("brk")
  }

  /** Materialized quantized vectors: stops projection collapse from
    * re-inlining the quantization transform into every per-pair dot
    * product after the joins. Memoized per (session, dir) — all six
    * emb_* queries share one quantization pass, released by
    * `PackResources.releaseAll()`. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    PackResources.checkpoint(s, dir, "emb_quant")(
      Tables.load(s, dir, "embeddings")
        .selectExpr("vec_id", s"$quant as q", "label"))

  import org.apache.spark.sql.expressions.Window

  /** Per-label centroid table (clabel, cvec = summed vector, n) of any
    * (label, q) frame — shared by the batch IVF quantizer and the
    * streaming-ingest standing-half table, so the two can never
    * desynchronize on the aggregation convention. */
  private def centsOf(e: DataFrame): DataFrame =
    e.selectExpr("label", "posexplode(q) as (i, v)")
      .groupBy("label", "i").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("i"), col("sv")))).as("cs"),
        max("n").as("n"))
      .selectExpr("cast(label as bigint) as clabel",
        "transform(cs, x -> x.sv) as cvec", "n")

  /** IVF coarse-quantizer table (one row per label: summed vector +
    * count), memoized — every IVF query broadcasts it. */
  private def ivfCents(s: SparkSession, dir: String): DataFrame =
    PackResources.checkpoint(s, dir, "emb_ivf_cents")(centsOf(emb(s, dir)))

  /** Standing-corpus (even vec_id) IVF centroid table, collected to
    * the driver for the streaming-ingest kernel (r14): (labels, ns,
    * summed-vectors), ordered by label. The collect is bounded by the
    * LABEL DOMAIN (a dimension, ~tens of rows), never the corpus —
    * the same table every IVF query broadcasts, here embedded in the
    * codegen'd NearestIvfCell so arriving vectors assign with zero
    * joins and zero state. */
  private[queries] def standingIvfCentroids(
      s: SparkSession, dir: String): (Seq[Long], Seq[Long], Seq[Seq[Long]]) = {
    val rows = centsOf(emb(s, dir).filter(col("vec_id") % 2 === 0))
      .orderBy("clabel")
      .collect()
    (rows.map(_.getLong(0)).toSeq,
      rows.map(_.getLong(2)).toSeq,
      rows.map(_.getSeq[Long](1).toSeq).toSeq)
  }

  /** IVF assignment rows (vec_id → nearest coarse cell): broadcast
    * centroid cross + per-vector argmax as a `max(struct(...))` partial
    * aggregation (the LPA pattern, GraphQueries) — the ×nCells rows
    * collapse MAP-SIDE to one per vector before the exchange and no
    * window sort runs at all; ties break to the smallest cell label
    * via the negated field. Memoized — this is an INDEX BUILD
    * artifact: built once, shared by every IVF query on the
    * (session, dir), released with the pack's other state. */
  private[queries] def ivfAssignedBuild(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).crossJoin(broadcast(ivfCents(s, dir)))
      .withColumn("dotv", dotI64(col("q"), col("cvec")))
      .selectExpr("vec_id", "q", "clabel", "dotv * 1000000 div n as score")
      // max(struct) compiles to a SortAggregate (struct buffer), but the
      // PARTIAL pass still collapses ×nCells rows to one per vector
      // map-side, before the exchange — the property that matters at
      // corpus scale; the local sort keys on the bare vec_id long
      .groupBy("vec_id")
      .agg(max(struct(col("score"), (-col("clabel")).as("nl"), col("q")))
        .as("b"))
      .select(col("vec_id"), col("b.q").as("q"), (-col("b.nl")).as("alabel"))

  private def ivfAssigned(s: SparkSession, dir: String): DataFrame =
    PackResources.checkpoint(s, dir, "emb_ivf_assigned")(
      ivfAssignedBuild(s, dir))

  /** Probe count (`spark.graft.ivf.nprobe`, default 2 — the DuckDB
    * gates pin the default): how many coarse cells each query scans.
    * The IVF recall/cost contract — candidates ≈ corpus·nProbe/nCells;
    * nProbe = nCells degenerates to exact search (spec'd). */
  private def ivfNProbe(s: SparkSession): Int =
    math.max(1, s.conf.get("spark.graft.ivf.nprobe", "2").toInt)

  /** IVF probe rows for the query set (vec_id < 5): each query's
    * nProbe best coarse cells, carrying the query vector. */
  private def ivfProbes(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < 5)
      .crossJoin(broadcast(ivfCents(s, dir)))
      .withColumn("dotv", dotI64(col("q"), col("cvec")))
      .selectExpr("vec_id as qid", "q as qv", "clabel as plabel",
        "dotv * 1000000 div n as score")
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("score"), asc("plabel"))))
      .filter(col("rk") <= ivfNProbe(s))
      .select(col("qid"), col("qv"), col("plabel"))

  /** Verified embedding near-dup pairs (v1 < v2, quantized dot ≥
    * 300000): hyperplane-bucket blocked, per-bucket capped — never
    * all-pairs. Shared by the pair gate and the clustering gate. */
  private def embNeardupPairs(s: SparkSession, dir: String): DataFrame = {
    val e = capBuckets(s,
      emb(s, dir).select(col("vec_id"), col("q"),
        hyperplaneBucket(col("q"), lshBits(s)).as("bkt")))
    val a = e.select(col("bkt"), col("vec_id").as("v1"), col("q").as("q1"))
    val b = e.select(col("bkt"), col("vec_id").as("v2"), col("q").as("q2"))
    a.join(b, Seq("bkt"))
      .filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"), dotI64(col("q1"), col("q2")).as("dot"))
      .filter(col("dot") >= 300000)
  }

  /** PQ subspace rows (vec_id, m, qm, cell): M=4 16-dim subvectors and
    * their 4-bit hyperplane cells. */
  private def pqCells(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).selectExpr("vec_id",
      """explode(transform(sequence(0,3), m ->
           struct(m as m, slice(q, m*16+1, 16) as qm))) as e""")
      .select(col("vec_id"), col("e.m").as("m"), col("e.qm").as("qm"))
      .select(col("vec_id"), col("m"), col("qm"),
        hyperplaneBucket(col("qm"), bits = 4, dims = 16).as("cell"))

  /** PQ codebook (m, ccell, cmean): ≤64 per-cell integer-mean subspace
    * centroids — one partial-agg shuffle, broadcast everywhere used. */
  private def pqCodebook(s: SparkSession, dir: String): DataFrame =
    pqCells(s, dir)
      .selectExpr("m", "cell", "posexplode(qm) as (i, v)")
      .groupBy("m", "cell", "i")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .groupBy("m", "cell")
      .agg(sort_array(collect_list(struct(col("i"), col("sv")))).as("cs"),
        max("n").as("n"))
      .selectExpr("m", "cell as ccell",
        "transform(cs, x -> x.sv div n) as cmean")

  /** Per-vector PQ code rows (vec_id, m, code): nearest codebook cell
    * per subspace, maximizing 2·v·c − c·c (integer nearest-by-L2) via
    * the same `max(struct(...))` map-side argmax as ivfAssigned — no
    * window sort, ×64 candidate rows collapse before the exchange.
    * Memoized like ivfAssigned — the compressed-index build artifact. */
  private[queries] def pqCodeRowsBuild(s: SparkSession, dir: String): DataFrame =
    pqCells(s, dir).join(broadcast(pqCodebook(s, dir)), "m")
      .select(col("vec_id"), col("m"), col("ccell"),
        (lit(2L) * dotI64(col("qm"), col("cmean"))
          - dotI64(col("cmean"), col("cmean"))).as("score"))
      .groupBy("vec_id", "m")
      .agg(max(struct(col("score"), (-col("ccell")).as("nc"))).as("b"))
      .select(col("vec_id"), col("m"), (-col("b.nc")).as("code"))

  private def pqCodeRows(s: SparkSession, dir: String): DataFrame =
    PackResources.checkpoint(s, dir, "emb_pq_coderows")(
      pqCodeRowsBuild(s, dir))

  /** PQ code rows pivoted to one row per vector (vec_id, c0..c3) — the
    * stored form of the compressed index. */
  private def pqCodesPivot(s: SparkSession, dir: String): DataFrame =
    pqCodeRows(s, dir)
      .groupBy("vec_id")
      .agg(
        max(when(col("m") === 0, col("code"))).as("c0"),
        max(when(col("m") === 1, col("code"))).as("c1"),
        max(when(col("m") === 2, col("code"))).as("c2"),
        max(when(col("m") === 3, col("code"))).as("c3"))

  /** IVF+PQ index artifacts persisted as bucketed parquet TABLES — the
    * production storage layout: assignment and pivoted codes both
    * `bucketBy(vec_id)`, so the search path's candidate join reads
    * co-located buckets and moves ZERO bytes over the network
    * (BucketingSpec pins the exchange-free shape; at 100 TB this join
    * is the only corpus-sized operation in ADC search). Build is
    * memoized per (session, dir) through the pack memo — one write per
    * pack run, and a bench retry's memo rollback rebuilds honestly.
    * Returns the two table names. */
  /** Once-per-table-name shutdown hook deleting the named tables'
    * warehouse directories (catalog entries die with the in-memory
    * catalog; the directories would otherwise outlive the JVM). */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Local filesystem path of the session warehouse, or None when the
    * conf value doesn't parse as a path-bearing URI (spaces/illegal
    * chars/opaque URIs — ADVICE r11): callers SKIP cleanup rather than
    * fail the query path. Hadoop's Path parser tolerates raw local
    * paths and `file:` URIs alike; the URISyntaxException shape that
    * killed `new java.net.URI(...)` lands in the Failure arm. */
  private def warehousePath(s: SparkSession): Option[String] =
    scala.util.Try {
      val conf = s.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(conf)
      Option(p.toUri.getPath).filter(_.nonEmpty).getOrElse(conf)
    }.toOption

  private def registerWarehouseCleanup(
      s: SparkSession, tables: Seq[String]): Unit = {
    val wh = warehousePath(s).getOrElse(return)
    tables.filter(cleanupRegistered.add).foreach { t =>
      val d = new java.io.File(wh, t)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) {
            val kids = f.listFiles()
            if (kids != null) kids.foreach(rm)
          }
          f.delete(): Unit
        }
        if (d.exists()) rm(d)
      }))
    }
  }

  private[queries] def bucketedIndex(s: SparkSession, dir: String): (String, String) = {
    // readable normalized name + a 128-bit digest of the RAW dir + a
    // session token: the normalization is lossy (all punctuation
    // collapses to '_'), 32-bit hashCode collides across dirs at
    // realistic catalog sizes, and the build DROPs + recursively
    // deletes the tables' warehouse directories — so a collision (or
    // two sessions sharing a warehouse on the same dir) would clobber
    // another index mid-query. The digest makes cross-dir collisions
    // cryptographically impossible; the app+session token scopes the
    // tables per application and session instance.
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(16).map(b => f"$b%02x").mkString
    val sessTok = java.lang.Integer.toHexString(
      s.sparkContext.applicationId.hashCode ^ System.identityHashCode(s))
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_") +
      "_" + digest + "_" + sessTok
    val (ta, tc) = (s"graft_ivfa_$tag", s"graft_pqc_$tag")
    // the session token makes each JVM run's tables unique, so without
    // cleanup every run would leave its full bucketed corpus+codes
    // behind in the warehouse — delete this run's directories at JVM
    // exit (only a hard kill leaks, and the next run can't collide
    // with leaked dirs because its token differs)
    registerWarehouseCleanup(s, Seq(ta, tc))
    PackResources.checkpoint(s, dir, "emb_bucketed_index") {
      val nb = math.max(1,
        s.conf.get("spark.graft.ann.index.buckets", "8").toInt)
      // the in-memory catalog forgets tables across JVMs but their
      // warehouse directories persist — clear both or saveAsTable fails
      Seq(ta, tc).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        warehousePath(s).foreach { wh =>
          val d = new java.io.File(wh, t)
          if (d.exists()) {
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete(): Unit
            }
            rm(d)
          }
        }
      }
      ivfAssigned(s, dir).drop("q")
        .write.bucketBy(nb, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(ta)
      pqCodesPivot(s, dir)
        .write.bucketBy(nb, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(tc)
      // sentinel for the memo: the artifact is the pair of tables
      s.range(0).toDF("sentinel")
    }
    (ta, tc)
  }

  /** Force the build-once ANN index artifacts for `dir`: quantized
    * vectors, IVF centroids + assignment, PQ codebook + pivoted codes,
    * and the bucketed warehouse tables. These are amortized build-once
    * artifacts (the production shape: an index is built in one pass and
    * served by every search after it), so the bench bills this as its
    * own `emb_ivfpq_build` row instead of letting Map order pick which
    * search gate inherits the ~7s construction (VERDICT r12 #2:
    * emb_ivfpq_search billed 36s on a degraded episode, 2.65s warm).
    * Memoized via PackResources — calling it before the timed loop
    * leaves the artifacts pinned for the family's timed gates. */
  def prebuildIndexArtifacts(s: SparkSession, dir: String): Unit = {
    ivfAssigned(s, dir).count()
    pqCodesPivot(s, dir).count()
    bucketedIndex(s, dir)
    ()
  }

  /** ADC scoring + per-query top-5 over a candidate set carrying
    * (vec_id, alabel, c0..c3) — shared by the memoized-artifact and
    * bucketed-table search paths. Per query, dot(q_m, cmean) for all
    * ≤64 codebook cells folds into ONE map keyed m·16+cell riding the
    * broadcast probe side; candidate scoring is four map lookups +
    * adds inside the scan. */
  private def adcSearch(s: SparkSession, dir: String, cand: DataFrame): DataFrame = {
    val probes = ivfProbes(s, dir)
    val lut = probes.select("qid", "qv").distinct()
      .crossJoin(broadcast(pqCodebook(s, dir)))
      .select(col("qid"),
        (col("m") * 16 + col("ccell")).as("k"),
        dotI64(expr("slice(qv, m*16+1, 16)"), col("cmean")).as("pdot"))
      .groupBy("qid")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("k"), col("pdot"))))).as("lut"))
    val wTop = Window.partitionBy("qid").orderBy(desc("adc"), asc("cid"))
    cand.join(broadcast(probes.join(broadcast(lut), "qid")),
        col("alabel") === col("plabel"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr("element_at(lut, 0*16+c0) + element_at(lut, 16+c1) + " +
          "element_at(lut, 32+c2) + element_at(lut, 48+c3)").as("adc"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .selectExpr("qid", "cid", "adc", "cast(rk as bigint) as rk")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force inner-product top-10 for query vectors vec_id < 5.
    "emb_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qv"))
      val cands = e.select(col("vec_id").as("cid"), col("q").as("cv"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), dotI64(col("qv"), col("cv")).as("dot"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .selectExpr("qid", "cid", "dot", "cast(rk as bigint) as rk")
    }),

    // LSH variant: candidates restricted to the query's hyperplane-sign
    // bucket (plus spark.graft.lsh.probes-1 one-bit-flip neighbor
    // buckets — probe buckets are distinct and a candidate lives in
    // exactly one bucket, so the expansion can't duplicate a (qid,cid)
    // pair); top-5 by the same exact dot product. The probe explode is
    // on the tiny broadcast query side — the corpus side still joins
    // once on its single bucket key.
    "emb_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("q"),
        hyperplaneBucket(col("q"), lshBits(s)).as("bkt"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qv"),
          explode(probeArray(s, col("bkt"))).as("bkt"))
      val cands = e.select(col("vec_id").as("cid"), col("q").as("cv"), col("bkt"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      cands.join(broadcast(queries), "bkt")
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), dotI64(col("qv"), col("cv")).as("dot"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .selectExpr("qid", "cid", "dot", "cast(rk as bigint) as rk")
    }),

    // ANN index QUALITY measurement in-engine: per query, how many of
    // the brute-force top-10 neighbors share the query's hyperplane
    // bucket — recall@10 of the LSH path as an exact integer (×10).
    // The pipeline operator a production ANN deployment runs on a
    // sample to tune bucket bits / probe counts; the brute-force side
    // is the same broadcast-queries × corpus-scan plan as emb_knn, so
    // measuring recall on an N-query sample costs one corpus pass.
    "emb_lsh_recall" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("q"),
        hyperplaneBucket(col("q"), lshBits(s)).as("bkt"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qv"), col("bkt").as("qbkt"))
      val cands = e.select(col("vec_id").as("cid"), col("q").as("cv"),
        col("bkt").as("cbkt"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), dotI64(col("qv"), col("cv")).as("dot"),
          // a true neighbor is "found" when its bucket is in the
          // query's PROBE set (own bucket at probes=1 — the gate
          // default; + one-bit flips beyond)
          array_contains(probeArray(s, col("qbkt")), col("cbkt"))
            .cast("long").as("hit"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .groupBy("qid")
        .agg(count(lit(1)).as("n_true"), sum("hit").as("n_bucket_hits"))
    }),

    // Multi-probe recall measurement at the 100 TB operating point:
    // bits UP to 12 (4096 buckets — small buckets, cheap within-bucket
    // work) with probes=4 recovering the recall a single probe loses.
    // Pinned literals (not the session confs) so the gate exercises
    // the probes>1 path deterministically against the DuckDB oracle,
    // which reproduces the same first-3-one-bit-flip probe set.
    "emb_lsh_recall_mp" -> ((s, dir) => {
      val bits = 12; val probes = 4
      val e = emb(s, dir).select(col("vec_id"), col("q"),
        hyperplaneBucket(col("q"), bits).as("bkt"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qv"), col("bkt").as("qbkt"))
      val cands = e.select(col("vec_id").as("cid"), col("q").as("cv"),
        col("bkt").as("cbkt"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), dotI64(col("qv"), col("cv")).as("dot"),
          array_contains(probeArrayN(col("qbkt"), probes), col("cbkt"))
            .cast("long").as("hit"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .groupBy("qid")
        .agg(count(lit(1)).as("n_true"), sum("hit").as("n_probe_hits"))
    }),

    // Embedding near-duplicate pairs (the brief's embedding-cosine
    // near-dup dedup operator): hyperplane-bucket blocking, exact
    // quantized inner product ≥ threshold — candidate generation joins
    // on the bucket key, never all-pairs.
    "emb_neardup" -> ((s, dir) => embNeardupPairs(s, dir)),

    // Embedding-level near-dup CLUSTERING (the SemDeDup shape: prune
    // whole groups of semantically-identical documents, keep one
    // representative): connected components over the verified pair
    // graph, computed by the engine's own mmin fixpoint — labels
    // propagate min-reachable-id, so the group id IS the canonical
    // representative (smallest vec_id). Same composition as
    // txt_neardup_groups; the pair pass is shared with emb_neardup via
    // the checkpoint memo.
    "emb_neardup_groups" -> ((s, dir) => {
      // localiterate (r10): the mmin label-propagation clique is
      // exactly the monotonic within-task shape — the component
      // fixpoint runs as ONE wave over the broadcast (tiny, verified)
      // pair graph instead of O(component diameter) scheduled jobs;
      // ineligible/oversized graphs fall back to the looped path
      val key = "spark.datalog.recursion.localiterate"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        PackResources.context(s, dir, "emb_neardup_groups")({
          val pairs = PackResources.checkpoint(s, dir, "emb_neardup_pairs")(
            embNeardupPairs(s, dir).select(col("v1"), col("v2")))
          val c = new graft.datalog.DatalogContext(s)
          c.loadProgram(
            "database({nd_e(X:long, Y:long), nd_n(X:long)}). " +
              "lbl(X, mmin<X>) <- nd_n(X). " +
              "lbl(Y, mmin<L>) <- lbl(X, L), nd_e(X, Y). " +
              "grp(X, min<L>) <- lbl(X, L).")
          c.registerTable("nd_e",
            pairs.union(pairs.select(col("v2"), col("v1"))))
          c.registerTable("nd_n",
            pairs.select(col("v1")).union(pairs.select(col("v2"))).distinct())
          c
        }).query("grp(V, G).")
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // Per-label centroids (IVF coarse quantizer building block), kept as
    // exact integer sums per dimension.
    "emb_centroids" -> ((s, dir) =>
      emb(s, dir)
        .selectExpr("label", "posexplode(q) as (i, v)")
        .groupBy(col("label"), col("i"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .selectExpr("cast(label as bigint) as label", "cast(i as bigint) as i",
          "s", "n")),

    // IVF assignment (the coarse-quantizer probe): every vector maps to
    // its nearest centroid by score = dot(v, centroid_sum)·10^6 div n —
    // exact integer mean comparison, no floats. The centroid table is
    // tiny (one row per label) → broadcast; the corpus side stays
    // partition-parallel with no shuffle — the 100 TB assignment plan.
    "emb_ivf_assign" -> ((s, dir) => {
      val e = emb(s, dir)
      val cents = e
        .selectExpr("label", "posexplode(q) as (i, v)")
        .groupBy("label", "i").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(sort_array(collect_list(struct(col("i"), col("sv")))).as("cs"),
          max("n").as("n"))
        .selectExpr("cast(label as bigint) as clabel",
          "transform(cs, x -> x.sv) as cvec", "n")
      e.crossJoin(broadcast(cents))
        .withColumn("dotv", dotI64(col("q"), col("cvec")))
        .selectExpr("vec_id", "clabel", "dotv * 1000000 div n as score")
        .groupBy("vec_id")
        .agg(max(struct(col("score"), (-col("clabel")).as("nl"))).as("b"))
        .select(col("vec_id"), (-col("b.nl")).as("assigned_label"),
          col("b.score").as("score"))
    }),

    // Product-quantization codes (the memory-compression half of a
    // production ANN index, alongside IVF's coarse partitioning): the
    // 64-dim vector splits into M=4 16-dim subspaces; each subspace gets
    // a 16-cell codebook and every subvector is coded by its nearest
    // cell, so a vector stores as 4 small codes (here 4 bits each)
    // instead of 64 floats — at 100 TB that's the difference between an
    // index that fits executor memory and one that doesn't. "Training"
    // is deterministic (no k-means RNG): cells are 4-bit hyperplane
    // buckets per subspace, codebook entries are per-cell integer-mean
    // centroids, and assignment maximizes 2·v·c − c·c (the integer form
    // of nearest-by-L2), so the oracle reproduces codes bit-for-bit.
    // Plan: one partial-agg shuffle builds codebooks (≤64 rows),
    // broadcast back, assignment scans the corpus shuffle-free — ADC
    // search then composes exactly like emb_ivf_search's probe join.
    "emb_pq_codes" -> ((s, dir) => pqCodesPivot(s, dir)),

    // Scalar quantization to int8 (SQ8 — the other standard index
    // compression next to PQ): each vector stores a per-vector scale
    // m = max|q_i| and 64 int8 codes code_i = q_i·127 div m; the gate
    // reports the scale, the code checksum and the exact L1
    // reconstruction error Σ|q_i − code_i·m div 127| — the quality
    // metric an index build monitors. Pure per-row arithmetic: scan-
    // parallel, zero shuffles, the same plan at any corpus size.
    "emb_sq8" -> ((s, dir) =>
      emb(s, dir)
        .selectExpr("vec_id", "q",
          "aggregate(q, cast(0 as bigint), (a, x) -> greatest(a, abs(x))) as m")
        .filter(col("m") > 0)
        .selectExpr("vec_id", "q", "m",
          "transform(q, x -> (x * 127) div m) as code")
        .selectExpr("vec_id", "m",
          "aggregate(code, cast(0 as bigint), (a, c) -> (a * 31 + c) % 1000000007) as code_sig",
          """aggregate(zip_with(q, code, (x, c) -> abs(x - (c * m) div 127)),
             cast(0 as bigint), (a, e) -> a + e) as l1_err""")),

    // Signed random projection (Johnson-Lindenstrauss sketch — the
    // third compression shape next to PQ and SQ8): 32-dim quantized
    // vectors project to 8 signed-sum components, sign(i,j) from a
    // closed-form integer hash so both engines derive the identical
    // "random" matrix with no materialized state (in production the
    // signs come from a tiny broadcast matrix; the closed form IS that
    // broadcast, fused into codegen). Map-only — zero shuffles, rides
    // the scan at any scale; exact int64 arithmetic end to end.
    "emb_rproj" -> ((s, dir) =>
      emb(s, dir)
        .selectExpr("vec_id",
          """transform(sequence(0, 7), j ->
               aggregate(sequence(0, size(q) - 1), cast(0 as bigint),
                 (a, i) -> a + element_at(q, i + 1) *
                   (case when ((i + 1) * (j + 2) * 2654435761L) % 97 < 48
                         then 1 else -1 end))) as r""")
        .selectExpr("vec_id",
          "r[0] as r0", "r[1] as r1", "r[2] as r2", "r[3] as r3",
          "r[4] as r4", "r[5] as r5", "r[6] as r6", "r[7] as r7")),

    // Full IVF top-k search (the complete ANN query path): queries probe
    // their nProbe=2 best coarse cells, candidates are only the vectors
    // ASSIGNED to a probed cell, exact top-5 by quantized dot within.
    // 100 TB plan: the centroid table broadcasts twice (assignment +
    // probe), assignment never shuffles the corpus, and the candidate
    // join is broadcast(queries)⋈assigned on the cell key — recall is
    // traded for touching nProbe/nCells of the corpus, which is the IVF
    // contract.
    "emb_ivf_search" -> ((s, dir) => {
      val wTop = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      ivfAssigned(s, dir)
        .join(broadcast(ivfProbes(s, dir)), col("alabel") === col("plabel"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          dotI64(col("qv"), col("q")).as("dot"))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 5)
        .selectExpr("qid", "cid", "dot", "cast(rk as bigint) as rk")
    }),

    // IVF + PQ search — the production ANN query path at 100 TB: IVF's
    // coarse cells prune the corpus to nProbe/nCells, and candidates
    // are scored from their 4 PQ codes instead of 64-wide vectors (ADC
    // — asymmetric distance computation). Per query, dot(q_m, cmean) is
    // precomputed for all ≤64 codebook cells and folded into ONE map
    // keyed m·16+cell that rides the broadcast probe side, so candidate
    // scoring is four map lookups + adds inside the scan: the corpus
    // never re-reads full vectors and the only corpus shuffle is the
    // assignment⋈codes join on vec_id (a real index build stores those
    // co-located — bucketed by vec_id — making even that one free).
    // Exact integer arithmetic end-to-end; the oracle reproduces every
    // ADC score bit-for-bit.
    "emb_ivfpq_search" -> ((s, dir) =>
      adcSearch(s, dir,
        ivfAssigned(s, dir).drop("q").join(pqCodesPivot(s, dir), "vec_id"))),

    // IVF+PQ search reading the PERSISTED bucketed index tables — the
    // full production loop: build artifacts, write them bucketBy
    // (vec_id), and run ADC search against the stored form. The
    // candidate join (assignment ⋈ codes) reads two co-located bucketed
    // scans and needs no exchange at any corpus size — what
    // emb_ivfpq_search's memoized variant only claims, this gate's
    // storage layout delivers (BucketingSpec asserts the zero-exchange
    // join on these very tables). Same answers as emb_ivfpq_search.
    "emb_ivfpq_bucketed" -> ((s, dir) => {
      val (ta, tc) = bucketedIndex(s, dir)
      adcSearch(s, dir, s.table(ta).join(s.table(tc), "vec_id"))
    }),

    // Two-stage retrieve-then-rerank — the production ANN answer path:
    // the ADC shortlist (emb_ivfpq_search's top-5, scored from 4-byte
    // PQ codes) is re-scored EXACTLY from the full vectors and cut to
    // top-3. Stage 2 touches only |queries|·5 rows: the shortlist
    // broadcasts into ONE corpus scan (semi-join prune — the full
    // vectors are re-read for the ~25 shortlisted candidates only,
    // never the corpus), so rerank cost is independent of corpus size
    // — the property that makes exact reranking affordable at 100 TB.
    "emb_ivfpq_rerank" -> ((s, dir) => {
      val shortlist = adcSearch(s, dir,
        ivfAssigned(s, dir).drop("q").join(pqCodesPivot(s, dir), "vec_id"))
        .select(col("qid"), col("cid"))
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qv"))
      val w = Window.partitionBy("qid").orderBy(desc("dot"), asc("cid"))
      e.select(col("vec_id").as("cid"), col("q").as("cv"))
        .join(broadcast(shortlist), "cid")
        .join(broadcast(queries), "qid")
        .select(col("qid"), col("cid"), dotI64(col("qv"), col("cv")).as("dot"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .selectExpr("qid", "cid", "dot", "cast(rk as bigint) as rk")
    })
  )

  // ---- DuckDB oracles (1-based lists; same integer formulas) ----

  private val quantD =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"

  private val dotD =
    "CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i])) AS BIGINT)"

  private val bucketD =
    """CAST(list_sum(list_transform(range(8), j ->
         CASE WHEN list_sum(list_transform(range(64), i ->
                v[i+1] * (((i*31 + j*17) % 7) - 3))) > 0
              THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "emb_knn" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
              CAST(list_sum(list_transform(range(1, len(q.v)+1),
                i -> q.v[i]*c.v[i])) AS BIGINT) AS dot
            FROM e q JOIN e c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 5),
          ranked AS (SELECT qid, cid, dot,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid ASC) AS rk
            FROM scored)
          SELECT qid, cid, dot, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 10""",
    "emb_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          eb AS (SELECT vec_id, v, $bucketD AS bkt FROM e),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
              CAST(list_sum(list_transform(range(1, len(q.v)+1),
                i -> q.v[i]*c.v[i])) AS BIGINT) AS dot
            FROM eb q JOIN eb c ON c.bkt = q.bkt AND c.vec_id != q.vec_id
            WHERE q.vec_id < 5),
          ranked AS (SELECT qid, cid, dot,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid ASC) AS rk
            FROM scored)
          SELECT qid, cid, dot, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 5""",
    "emb_lsh_recall" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          eb AS (SELECT vec_id, v, $bucketD AS bkt FROM e),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
              CAST(list_sum(list_transform(range(1, len(q.v)+1),
                i -> q.v[i]*c.v[i])) AS BIGINT) AS dot,
              CASE WHEN c.bkt = q.bkt THEN 1 ELSE 0 END AS hit
            FROM eb q JOIN eb c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 5),
          ranked AS (SELECT qid, cid, dot, hit,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid ASC) AS rk
            FROM scored)
          SELECT qid, CAST(count(*) AS BIGINT) AS n_true,
                 CAST(sum(hit) AS BIGINT) AS n_bucket_hits
          FROM ranked WHERE rk <= 10 GROUP BY qid""",
    "emb_lsh_recall_mp" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          eb AS (SELECT vec_id, v,
            CAST(list_sum(list_transform(range(12), j ->
              CASE WHEN list_sum(list_transform(range(64), i ->
                     v[i+1] * (((i*31 + j*17) % 7) - 3))) > 0
                   THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS bkt FROM e),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS cid,
              CAST(list_sum(list_transform(range(1, len(q.v)+1),
                i -> q.v[i]*c.v[i])) AS BIGINT) AS dot,
              CASE WHEN c.bkt IN (q.bkt, xor(q.bkt, CAST(1 AS BIGINT)),
                                  xor(q.bkt, CAST(2 AS BIGINT)),
                                  xor(q.bkt, CAST(4 AS BIGINT)))
                   THEN 1 ELSE 0 END AS hit
            FROM eb q JOIN eb c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 5),
          ranked AS (SELECT qid, cid, dot, hit,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid ASC) AS rk
            FROM scored)
          SELECT qid, CAST(count(*) AS BIGINT) AS n_true,
                 CAST(sum(hit) AS BIGINT) AS n_probe_hits
          FROM ranked WHERE rk <= 10 GROUP BY qid""",
    "emb_neardup" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          eb AS (SELECT vec_id, v, $bucketD AS bkt FROM e)
          SELECT a.vec_id AS v1, b.vec_id AS v2,
            CAST(list_sum(list_transform(range(1, len(a.v)+1),
              i -> a.v[i]*b.v[i])) AS BIGINT) AS dot
          FROM eb a JOIN eb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
          WHERE list_sum(list_transform(range(1, len(a.v)+1),
              i -> a.v[i]*b.v[i])) >= 300000""",
    "emb_neardup_groups" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          eb AS (SELECT vec_id, v, $bucketD AS bkt FROM e),
          pr AS (SELECT a.vec_id AS v1, b.vec_id AS v2
            FROM eb a JOIN eb b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
            WHERE list_sum(list_transform(range(1, len(a.v)+1),
                i -> a.v[i]*b.v[i])) >= 300000),
          ed AS (SELECT v1 AS s, v2 AS t FROM pr UNION SELECT v2, v1 FROM pr),
          nd AS (SELECT DISTINCT s FROM ed),
          l(x, lbl) AS (
            SELECT s, s FROM nd
            UNION
            SELECT ed.t, l.lbl FROM l JOIN ed ON ed.s = l.x)
          SELECT CAST(x AS BIGINT) AS v, CAST(min(lbl) AS BIGINT) AS g
          FROM l GROUP BY x""",
    "emb_centroids" ->
      s"""WITH e AS (SELECT label, $quantD AS v FROM embeddings)
          SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
            CAST(sum(v[i+1]) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
          FROM e, range(64) r(i) GROUP BY label, i""",
    "emb_ivf_assign" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v, label FROM embeddings),
          c AS (SELECT CAST(label AS BIGINT) AS clabel, i,
                  CAST(sum(v[i+1]) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
                FROM e, range(64) r(i) GROUP BY label, i),
          cv AS (SELECT clabel, list(sv ORDER BY i) AS cvec, min(n) AS n
                 FROM c GROUP BY clabel),
          scored AS (SELECT e.vec_id, cv.clabel,
              CAST(list_sum(list_transform(range(1, 65),
                i -> e.v[i]*cv.cvec[i])) * 1000000 // cv.n AS BIGINT) AS score
            FROM e, cv),
          ranked AS (SELECT vec_id, clabel, score,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY score DESC, clabel ASC) AS rk
            FROM scored)
          SELECT vec_id, clabel AS assigned_label, score
          FROM ranked WHERE rk = 1""",
    "emb_pq_codes" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v FROM embeddings),
          sv AS (SELECT vec_id, m, list_slice(v, m*16+1, m*16+16) AS qm
                 FROM e, range(4) r(m)),
          cells AS (SELECT vec_id, m, qm,
            CAST(list_sum(list_transform(range(4), j ->
              CASE WHEN list_sum(list_transform(range(16), i ->
                     qm[i+1] * (((i*31 + j*17) % 7) - 3))) > 0
                   THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS cell FROM sv),
          comp AS (SELECT m, cell, i, CAST(sum(qm[i+1]) AS BIGINT) AS sv_,
              CAST(count(*) AS BIGINT) AS n
            FROM cells, range(16) r(i) GROUP BY m, cell, i),
          cb AS (SELECT m, cell AS ccell, list(sv_ // n ORDER BY i) AS cmean
                 FROM comp GROUP BY m, cell),
          scored AS (SELECT c.vec_id, c.m, cb.ccell,
              CAST(2 * list_sum(list_transform(range(1,17), i -> c.qm[i]*cb.cmean[i]))
                 - list_sum(list_transform(range(1,17), i -> cb.cmean[i]*cb.cmean[i]))
                AS BIGINT) AS score
            FROM cells c JOIN cb ON cb.m = c.m),
          ranked AS (SELECT vec_id, m, ccell,
              ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                 ORDER BY score DESC, ccell ASC) AS rk
            FROM scored)
          SELECT vec_id,
            CAST(max(CASE WHEN m = 0 THEN ccell END) AS BIGINT) AS c0,
            CAST(max(CASE WHEN m = 1 THEN ccell END) AS BIGINT) AS c1,
            CAST(max(CASE WHEN m = 2 THEN ccell END) AS BIGINT) AS c2,
            CAST(max(CASE WHEN m = 3 THEN ccell END) AS BIGINT) AS c3
          FROM ranked WHERE rk = 1 GROUP BY vec_id""",
    "emb_sq8" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS q FROM embeddings),
          mx AS (SELECT vec_id, q,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(q, x -> abs(x))), (a, b) -> greatest(a, b)) AS m
            FROM e),
          cd AS (SELECT vec_id, q, m,
              list_transform(q, x -> (x * 127) // m) AS code
            FROM mx WHERE m > 0)
          SELECT vec_id, CAST(m AS BIGINT) AS m,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), code),
              (a, c) -> (a * 31 + c) % 1000000007) AS BIGINT) AS code_sig,
            CAST(list_sum(list_transform(range(len(q)),
              i -> abs(q[i+1] - (code[i+1] * m) // 127))) AS BIGINT) AS l1_err
          FROM cd""",
    "emb_rproj" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS q FROM embeddings),
          p AS (SELECT vec_id,
              list_transform(generate_series(0, 7), j ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1, len(q)), i ->
                    q[i] * (CASE WHEN (i * (j + 2) * 2654435761) % 97 < 48
                                 THEN 1 ELSE -1 END))),
                  (a, b) -> a + b)) AS r
            FROM e)
          SELECT vec_id,
            CAST(r[1] AS BIGINT) AS r0, CAST(r[2] AS BIGINT) AS r1,
            CAST(r[3] AS BIGINT) AS r2, CAST(r[4] AS BIGINT) AS r3,
            CAST(r[5] AS BIGINT) AS r4, CAST(r[6] AS BIGINT) AS r5,
            CAST(r[7] AS BIGINT) AS r6, CAST(r[8] AS BIGINT) AS r7
          FROM p""",
    "emb_ivf_search" ->
      s"""WITH e AS (SELECT vec_id, $quantD AS v, label FROM embeddings),
          c AS (SELECT CAST(label AS BIGINT) AS clabel, i,
                  CAST(sum(v[i+1]) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
                FROM e, range(64) r(i) GROUP BY label, i),
          cv AS (SELECT clabel, list(sv ORDER BY i) AS cvec, min(n) AS n
                 FROM c GROUP BY clabel),
          scoredc AS (SELECT e.vec_id, e.v, cv.clabel,
              CAST(list_sum(list_transform(range(1, 65),
                i -> e.v[i]*cv.cvec[i])) * 1000000 // cv.n AS BIGINT) AS score
            FROM e, cv),
          assigned AS (SELECT vec_id, v, clabel AS alabel FROM (
              SELECT vec_id, v, clabel, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY score DESC, clabel ASC) AS rk FROM scoredc)
            WHERE rk = 1),
          probes AS (SELECT vec_id AS qid, v AS qv, clabel AS plabel FROM (
              SELECT vec_id, v, clabel, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY score DESC, clabel ASC) AS rk
              FROM scoredc WHERE vec_id < 5)
            WHERE rk <= 2),
          scored AS (SELECT p.qid, a.vec_id AS cid,
              CAST(list_sum(list_transform(range(1, 65),
                i -> p.qv[i]*a.v[i])) AS BIGINT) AS dot
            FROM probes p JOIN assigned a ON a.alabel = p.plabel
            WHERE a.vec_id != p.qid),
          ranked AS (SELECT qid, cid, dot,
              ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY dot DESC, cid ASC) AS rk
            FROM scored)
          SELECT qid, cid, dot, CAST(rk AS BIGINT) AS rk
          FROM ranked WHERE rk <= 5""",
    "emb_ivfpq_search" -> ivfpqSearchSql,
    "emb_ivfpq_rerank" ->
      s"""WITH base AS ($ivfpqSearchSql),
          e2 AS (SELECT vec_id, $quantD AS v FROM embeddings),
          rer AS (SELECT b.qid, b.cid,
              CAST(list_sum(list_transform(range(1, 65),
                i -> q.v[i]*c.v[i])) AS BIGINT) AS dot
            FROM base b
            JOIN e2 q ON q.vec_id = b.qid
            JOIN e2 c ON c.vec_id = b.cid),
          rr AS (SELECT qid, cid, dot,
              ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY dot DESC, cid ASC) AS rk
            FROM rer)
          SELECT qid, cid, dot, CAST(rk AS BIGINT) AS rk
          FROM rr WHERE rk <= 3""",
    // same answers by construction — the bucketed gate differs only in
    // the storage layout of the index artifacts
    "emb_ivfpq_bucketed" -> ivfpqSearchSql
  )

  private lazy val ivfpqSearchSql =
      s"""WITH e AS (SELECT vec_id, $quantD AS v, label FROM embeddings),
          c AS (SELECT CAST(label AS BIGINT) AS clabel, i,
                  CAST(sum(v[i+1]) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
                FROM e, range(64) r(i) GROUP BY label, i),
          cv AS (SELECT clabel, list(sv ORDER BY i) AS cvec, min(n) AS n
                 FROM c GROUP BY clabel),
          scoredc AS (SELECT e.vec_id, e.v, cv.clabel,
              CAST(list_sum(list_transform(range(1, 65),
                i -> e.v[i]*cv.cvec[i])) * 1000000 // cv.n AS BIGINT) AS score
            FROM e, cv),
          assigned AS (SELECT vec_id, clabel AS alabel FROM (
              SELECT vec_id, clabel, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY score DESC, clabel ASC) AS rk FROM scoredc)
            WHERE rk = 1),
          probes AS (SELECT vec_id AS qid, v AS qv, clabel AS plabel FROM (
              SELECT vec_id, v, clabel, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY score DESC, clabel ASC) AS rk
              FROM scoredc WHERE vec_id < 5)
            WHERE rk <= 2),
          sv2 AS (SELECT vec_id, m, list_slice(v, m*16+1, m*16+16) AS qm
                  FROM e, range(4) r(m)),
          cells AS (SELECT vec_id, m, qm,
            CAST(list_sum(list_transform(range(4), j ->
              CASE WHEN list_sum(list_transform(range(16), i ->
                     qm[i+1] * (((i*31 + j*17) % 7) - 3))) > 0
                   THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS cell FROM sv2),
          comp AS (SELECT m, cell, i, CAST(sum(qm[i+1]) AS BIGINT) AS sv_,
              CAST(count(*) AS BIGINT) AS n
            FROM cells, range(16) r(i) GROUP BY m, cell, i),
          cb AS (SELECT m, cell AS ccell, list(sv_ // n ORDER BY i) AS cmean
                 FROM comp GROUP BY m, cell),
          pqscored AS (SELECT c2.vec_id, c2.m, cb.ccell,
              CAST(2 * list_sum(list_transform(range(1,17), i -> c2.qm[i]*cb.cmean[i]))
                 - list_sum(list_transform(range(1,17), i -> cb.cmean[i]*cb.cmean[i]))
                AS BIGINT) AS score
            FROM cells c2 JOIN cb ON cb.m = c2.m),
          codes AS (SELECT vec_id, m, ccell AS code FROM (
              SELECT vec_id, m, ccell, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                ORDER BY score DESC, ccell ASC) AS rk FROM pqscored)
            WHERE rk = 1),
          lut AS (SELECT q.qid, cb.m, cb.ccell,
              CAST(list_sum(list_transform(range(1,17), i ->
                list_slice(q.qv, cb.m*16+1, cb.m*16+16)[i]*cb.cmean[i]))
                AS BIGINT) AS pdot
            FROM (SELECT DISTINCT qid, qv FROM probes) q, cb),
          sc AS (SELECT p.qid, a.vec_id AS cid, CAST(sum(l.pdot) AS BIGINT) AS adc
            FROM probes p JOIN assigned a ON a.alabel = p.plabel
            JOIN codes k ON k.vec_id = a.vec_id
            JOIN lut l ON l.qid = p.qid AND l.m = k.m AND l.ccell = k.code
            WHERE a.vec_id != p.qid GROUP BY p.qid, a.vec_id),
          ranked AS (SELECT qid, cid, adc,
              ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY adc DESC, cid ASC) AS rk
            FROM sc)
          SELECT qid, cid, adc, CAST(rk AS BIGINT) AS rk
          FROM ranked WHERE rk <= 5"""
}
