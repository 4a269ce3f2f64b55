package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale
import org.apache.spark.sql.SparkSession

/** Two-decades-above-bench scale probe (judge r14 #6): runs the most
  * scale-sensitive gates at an sf10 fixture (100x the sf0.1 bench scale,
  * 10x the per-round sf1 tail) and commits the walls as
  * BENCH_SF10_SUBSET.json — the first direct measurement behind the
  * 100x-scale-up claim, beyond plan shape and the sf0.1→sf1 exponent.
  *
  * Not part of the per-round driver bench (a full sf10 sweep would eat
  * the round's wall-clock budget); invoked by hand when the scale tail
  * changes:
  *
  *   python3 tools/gen_scale.py /root/testdata/sf0.1 target/scratch/tmp_sf1 10
  *   python3 tools/gen_scale.py target/scratch/tmp_sf1 target/scratch/tmp_sf10 10
  *   SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleBench"
  *
  * 64g heap is required: the sf10 fixture's 100-member near-dup
  * families make the pairwise gates' join outputs ~110x their sf1
  * volume, and the 8g default OOMed txt_span_dedup's window sort
  * (whole-partition buffering across 32 concurrent tasks). Trailing
  * args filter the subset for split/resume runs.
  *
  * Subset = the gates whose cost is super-linear in corpus size when the
  * blocking/fixpoint math is wrong (the judge-named set + the 63-bit
  * simhash twin): pair generation under two blocking geometries, n-gram
  * verify, positional span dedup, perceptual-hash pairs + its
  * connected-components fixpoint, and transitive closure.
  *
  * Billing mirrors the BENCH_SF1_SUBSET tail: memos dropped once before
  * the timed loop, gates run in the fixed order below (mm_phash_groups
  * before mm_phash_pairs, so the shared phash memo bills to groups as it
  * does in the bench Map order). A gate warmup at sf0.01 absorbs the
  * first-of-family JIT surcharge on the real code paths. The same
  * fixed-work probes as Bench ride in the file; a run over the absolute
  * probe ceilings lands in a gitignored _SUSPECT file, never over the
  * committed walls.
  */
object ScaleBench {
  private def fmt(v: Double): String =
    String.format(Locale.US, "%.3f", Double.box(v))

  // fixed documented order — NOT Map order: groups before pairs so the
  // shared phash memo bills where the committed sf0.1/sf1 baselines
  // bill it; simhash64 before simhash_pairs (independent memos). The
  // two quadratic-output gates run LAST: the sf10 fixture is two
  // gen_scale decades (100-member near-dup families), so pairwise
  // answers grow ~C(100,2)/C(10,2) = 110x while data grows 10x — a
  // death there (heap/disk) must not take earlier walls with it.
  private[graft] val subset = Seq(
    "dl_tc", "txt_simhash64_pairs", "txt_simhash_pairs",
    "mm_phash_groups", "mm_phash_pairs",
    "txt_ngram_jaccard", "txt_span_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
      "/root/repo/target/scratch/tmp_sf10")
    require(new java.io.File(sfDir).isDirectory,
      s"sf10 fixture missing: $sfDir (run tools/gen_scale.py twice)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // sf10 partitions default 4x the core count (vs = cores at sf0.1):
    // the quadratic-family join outputs put ~50GB through single
    // shuffles — 32 partitions would hold ~1.5GB each in the window
    // sort, the shape that OOMed the first probe run; 128 keeps
    // per-partition state inside executor memory at this scale, the
    // same partition-count-scales-with-data rule a cluster deploy uses
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      (cpus.toInt * 4).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // real-gate warmup two decades below: absorbs codegen/JIT surcharge
    // for exactly the kernels the timed loop runs (simhash/phash/jaccard
    // expressions, fixpoint claim path) without touching the sf10 data
    // trailing args filter the subset (resume a split run after a
    // heap/disk death without re-paying the finished gates)
    val wanted = if (args.isEmpty) subset else subset.filter(args.toSet)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR2",
      "/root/testdata/sf0.01")
    if (new java.io.File(warmDir).isDirectory) {
      wanted.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
      graft.queries.PackResources.releaseAll()
    }
    val (probeSec, probeStSec) = Bench.fixedWorkProbes(spark)
    var errors = Vector.empty[(String, String)]
    graft.queries.PackResources.releaseAll()
    val times: Seq[(String, Double)] = wanted.flatMap { n =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        Some(n -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
          // an errored wall is time-to-failure, not work — it never
          // lands as a wall row, only as an err_ annotation (the same
          // rule the full bench's refused_errors prong enforces)
          errors :+= (n -> msg.replaceAll("\\s+", " ").take(80))
          None
      }
    }
    // Post-loop probe re-measure: a gate death (OOM, disk) can leave
    // the box degraded for the gates that ran after it, and the
    // pre-loop probes are blind to that. A run carrying errors whose
    // post-loop probes fail the ceilings lands aside; both readings
    // ride in the file either way.
    val (probeSecAfter, probeStSecAfter) = Bench.fixedWorkProbes(spark)
    val probeMax = sys.env.getOrElse("SPARK_GRAFT_PROBE_MAX", "0.25").toDouble
    val probeStMax = sys.env.getOrElse("SPARK_GRAFT_PROBE_ST_MAX", "0.32").toDouble
    val write =
      if (probeSec > probeMax || probeStSec > probeStMax) "refused_probe"
      else if (errors.nonEmpty &&
        (probeSecAfter > probeMax || probeStSecAfter > probeStMax))
        "refused_post_error_probe"
      else "ok"
    // Split/resume merge: a filtered run must not destroy the committed
    // walls of the gates it did not run — carry the target file's rows
    // forward for every subset gate outside this run (this run's rows,
    // including a re-run of a previously-recorded gate, always win).
    val target =
      if (write == "ok") "BENCH_SF10_SUBSET.json"
      else "BENCH_SF10_SUBSET_SUSPECT.json"
    val carried: Seq[(String, Double)] =
      if (wanted == subset) Nil
      else try {
        val txt = new String(Files.readAllBytes(Paths.get(target)),
          StandardCharsets.UTF_8)
        // only carry rows measured at THIS run's fixture — a stale
        // side file from another scale must not leak its walls in
        val sfOk = """"sf":\s*"([^"]*)"""".r.findFirstMatchIn(txt)
          .exists(_.group(1) == sfDir)
        if (!sfOk) Nil
        else {
          val prior = (""""([A-Za-z0-9_]+)":\s*(\d+\.\d+)""".r
            .findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble)).toMap
          subset.filterNot(wanted.contains)
            .flatMap(g => prior.get(g).map(g -> _))
        }
      } catch { case _: Throwable => Nil }
    val all = (carried ++ times).sortBy { case (k, _) => subset.indexOf(k) }
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, m) =>
        s"""  "err_$k": "${m.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
        .mkString("", ",\n", ",\n")
    val json = all.map { case (k, v) => s"""  "$k": ${fmt(v)}""" }
      .mkString("{\n", ",\n", ",\n") + errJson +
      s"""  "total": ${fmt(all.map(_._2).sum)},\n""" +
      s"""  "baseline_write": "$write",\n""" +
      s"""  "probe_seconds": ${fmt(probeSec)},\n""" +
      s"""  "probe_st_seconds": ${fmt(probeStSec)},\n""" +
      s"""  "probe_seconds_after": ${fmt(probeSecAfter)},\n""" +
      s"""  "probe_st_seconds_after": ${fmt(probeStSecAfter)},\n""" +
      (if (carried.isEmpty) ""
       else s"""  "carried": "${carried.map(_._1).mkString(",")}",\n""") +
      s"""  "order": "fixed as listed; memos dropped once before the loop",\n""" +
      s"""  "sf": "$sfDir",\n  "cpus": $cpus\n}\n"""
    Files.write(Paths.get(target), json.getBytes(StandardCharsets.UTF_8))
    println(s"""{"metric":"sf10_total","value":${fmt(all.map(_._2).sum)},"unit":"sec","n":${all.size},"write":"$write","probe_seconds":${fmt(probeSec)},"probe_st_seconds":${fmt(probeStSec)},"file":"$target"}""")
    SparkEntry.release()
    spark.stop()
  }
}
