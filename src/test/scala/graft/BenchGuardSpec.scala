package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stall-detector's pure verdict logic (Bench.stallVerdict):
  * the r7 episode — five heavy queries inflated 2.8-4.3x while the
  * median shared-query ratio sat at 1.04 — must flag, a clean run and
  * a run with a single genuine regression must not. */
class BenchGuardSpec extends AnyFunSuite {

  private def envSuspect(median: Double, tail: Seq[String]): Boolean =
    median > 1.3 || tail.size >= 3

  test("r7-style heavy-tail episode flags env_suspect") {
    // 24 small/medium queries on-baseline, 5 heavies inflated — the
    // shape of BENCH_r07.json (total 105.3s vs clean 67.5s)
    val baseline =
      (1 to 24).map(i => s"ok$i" -> 1.0).toMap ++ Map(
        "dl_tc" -> 2.01, "dl_cc" -> 1.91, "txt_neardup_groups" -> 1.05,
        "txt_lsh_pairs" -> 0.62, "q1_agg" -> 0.26)
    val run =
      (1 to 24).map(i => s"ok$i" -> 1.04) ++ Seq(
        "dl_tc" -> 6.75, "dl_cc" -> 5.86, "txt_neardup_groups" -> 4.41,
        "txt_lsh_pairs" -> 2.47, "q1_agg" -> 0.94)
    val (median, tail) = Bench.stallVerdict(run, baseline, Set.empty)
    assert(median <= 1.3, "the old median gate alone must NOT trip (that's the r7 miss)")
    // q1_agg (baseline 0.26 < 0.5) doesn't vote; the four heavies do
    assert(tail.toSet == Set("dl_tc", "dl_cc", "txt_neardup_groups", "txt_lsh_pairs"))
    assert(envSuspect(median, tail))
  }

  test("clean run does not flag") {
    val baseline = (1 to 29).map(i => s"q$i" -> (0.3 + i * 0.1)).toMap
    val run = baseline.toSeq.map { case (k, v) => k -> v * 1.05 }
    val (median, tail) = Bench.stallVerdict(run, baseline, Set.empty)
    assert(median < 1.3 && tail.isEmpty && !envSuspect(median, tail))
  }

  test("one or two genuine regressions stay visible, not env_suspect") {
    val baseline = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val run = (1 to 20).map { i =>
      s"q$i" -> (if (i <= 2) 3.0 else 1.0)
    }
    val (median, tail) = Bench.stallVerdict(run, baseline, Set.empty)
    assert(tail.size == 2 && !envSuspect(median, tail))
  }

  test("drift estimate: warms up at 1.0, tracks the median, caps at 2.0") {
    // fewer than 8 samples: no estimate yet (a couple of early outliers
    // must not widen the bands for everyone after them)
    assert(Bench.driftEstimate(Seq(3.0, 3.0, 3.0)) == 1.0)
    // a uniformly ~1.5x box: bands scale to the observed drift
    assert(Bench.driftEstimate(Seq.fill(9)(1.5)) == 1.5)
    // never below 1.0 (a fast box must not TIGHTEN the bands)
    assert(Bench.driftEstimate(Seq.fill(9)(0.5)) == 1.0)
    // ADVICE r10: a genuine uniform 3x code regression would inflate
    // its own drift estimate and suppress the retries/flags that would
    // expose it — the cap holds the bands at 2x so such a run floods
    // the suspect list instead
    assert(Bench.driftEstimate(Seq.fill(9)(3.0)) == 2.0)
  }

  test("retry rollback: releaseNewSince drops only what the query built") {
    // The r8 fabrication: a stall-retried query re-ran against the memo
    // its own first run had checkpointed and min() recorded the warm
    // time. The bench now snapshots before each query and rolls back
    // what that query pinned, so a retry rebuilds its own memos (cold,
    // like run 1) while memos built by EARLIER queries stay warm (also
    // like run 1).
    import graft.queries.PackResources
    val spark = graft.datalog.TestSpark.spark
    PackResources.releaseAll()
    var priorBuilds = 0
    var ownBuilds = 0
    def prior() = PackResources.checkpoint(spark, "/bench-guard", "prior") {
      priorBuilds += 1; spark.range(10).toDF("v")
    }
    def own() = PackResources.checkpoint(spark, "/bench-guard", "own") {
      ownBuilds += 1; spark.range(20).toDF("v")
    }
    prior().count() // an earlier query's memo, warm before the snapshot
    val snap = PackResources.snapshot()
    assert(own().count() == 20 && prior().count() == 10) // first timed run
    assert(priorBuilds == 1 && ownBuilds == 1)
    PackResources.releaseNewSince(snap) // retry rollback
    assert(own().count() == 20 && prior().count() == 10) // the retry
    assert(ownBuilds == 2, "the query's own memo must rebuild on retry")
    assert(priorBuilds == 1, "earlier queries' memos must stay warm")
    PackResources.releaseAll()
  }

  test("errored queries vote in neither the median nor the tail") {
    // three fast-failing heavies (time-to-failure ~0) would drag the
    // median to ~0 and mask a uniform 1.5x stall
    val baseline = (1 to 10).map(i => s"q$i" -> 1.0).toMap ++
      Map("e1" -> 2.0, "e2" -> 2.0, "e3" -> 2.0)
    val run = (1 to 10).map(i => s"q$i" -> 1.5) ++
      Seq("e1" -> 0.01, "e2" -> 0.01, "e3" -> 0.01)
    val errored = Set("e1", "e2", "e3")
    val (median, tail) = Bench.stallVerdict(run, baseline, errored)
    assert(median == 1.5 && envSuspect(median, tail))
    // and an errored slow query is not a tail suspect either
    val (_, tail2) = Bench.stallVerdict(
      Seq("e1" -> 9.0, "e2" -> 9.0, "e3" -> 9.0), baseline, errored)
    assert(tail2.isEmpty)
  }

  test("committed-baseline writes are probe-gated (degraded episodes write aside)") {
    def d(sus: Boolean, cfg: Boolean, p: Double, pst: Double,
        err: Boolean = false) =
      Bench.baselineWriteDecision(sus, cfg, err, p, pst, 0.25, 0.32)
    // clean run on a clean box at the committed config → may commit
    assert(d(false, true, 0.12, 0.27) == "ok")
    // suspect verdict always wins (even with clean probes)
    assert(d(true, true, 0.12, 0.27) == "refused_suspect")
    // an errored run never self-commits (r14: a time-to-failure wall —
    // incl. a failed prebuild's synthetic entry — must not become a
    // baseline, mirroring promote_baseline.py's errors-block refusal)
    assert(d(false, true, 0.12, 0.27, err = true) == "refused_errors")
    // config mismatch next (a run at another sf/cpus never clobbers)
    assert(d(false, false, 0.12, 0.27) == "refused_config")
    // degraded probes refuse even a no-suspect run — judge r12 #1:
    // the r12 driver episode (0.364/0.402) must land aside
    assert(d(false, true, 0.364, 0.402) == "refused_probe")
    assert(d(false, true, 0.12, 0.33) == "refused_probe")
    assert(d(false, true, 0.26, 0.27) == "refused_probe")
  }

  test("r14 near-miss: a ~1.3x-drifted run must not replace a cleaner baseline") {
    // BENCH_r14's final run: probes 0.116/0.288 vs the committed clean
    // file's own 0.071/0.273, per-gate median 1.275 — under the 0.25/
    // 0.32 absolute ceilings AND the 1.3 env_suspect median, so it
    // overwrote the 138.67s baseline with a 191.9s map. Both new
    // write-only prongs must each refuse it independently.
    def d(p: Double, pst: Double, median: Double,
        committed: Option[(Double, Double)]) =
      Bench.baselineWriteDecision(false, true, false, p, pst, 0.25, 0.32,
        median, committed)
    // relative probe prong alone (median below 1.15): 0.116 > 1.15*0.071
    assert(d(0.116, 0.288, 1.0, Some((0.071, 0.273))) == "refused_probe_rel")
    // median prong alone (probes match the committed file)
    assert(d(0.071, 0.273, 1.275, Some((0.071, 0.273))) == "refused_median")
    // the full r14 shape: refused (probe_rel fires first)
    assert(d(0.116, 0.288, 1.275, Some((0.071, 0.273))) == "refused_probe_rel")
    // a genuinely clean replacement run still commits
    assert(d(0.075, 0.270, 1.02, Some((0.071, 0.273))) == "ok")
    // probe_st degradation refuses even when the spark probe is fine
    assert(d(0.071, 0.320, 1.0, Some((0.071, 0.273))) == "refused_probe_rel")
    // a legacy baseline file without recorded probes: relative prong
    // skips (no reference), median prong still guards
    assert(d(0.116, 0.288, 1.275, None) == "refused_median")
    assert(d(0.116, 0.288, 1.0, None) == "ok")
    // faster-than-baseline bypass (r15): a shared-gate median strictly
    // under 1.0 with p75 <= 1.05 proves the box measured the code
    // faster than the walls being retired across the bulk of the suite
    // — a noisy probe sample must not freeze a strictly better run
    // (the r15 shape: probes 0.086/0.224 vs a 0.071-probe file,
    // median 0.869, p75 1.03). Since r20's symmetric prong the bypass
    // only clears the SLOWER-direction probe check: the r15 shape's st
    // probe (0.224 vs committed 0.273, 1.22x healthier) now refuses as
    // refused_probe_fast — on a healthier box a sub-1.0 median is
    // exactly what box drift produces, so it cannot distinguish code
    // from box (judge r19 #3; promote_baseline.py stays the deliberate
    // path for adopting a healthier window's walls).
    def db(p: Double, pst: Double, med: Double, cp: Option[(Double, Double)],
           p75: Double): String =
      Bench.baselineWriteDecision(false, true, false, p, pst, 0.25, 0.32,
        med, cp, p75)
    assert(db(0.086, 0.224, 0.869, Some((0.071, 0.273)), 1.03)
      == "refused_probe_fast")
    // the same median/p75 shape on probes WITHIN the +-1.15 window of
    // the committed file's still commits (the bypass's real purpose:
    // a noisy slower spark-probe sample on an equivalent-health box)
    assert(db(0.086, 0.270, 0.869, Some((0.071, 0.273)), 1.03) == "ok")
    // ...but the bypass needs STRICT improvement: at exactly 1.0 the
    // relative prong still applies
    assert(db(0.086, 0.224, 1.0, Some((0.071, 0.273)), 1.0)
      == "refused_probe_rel")
    // ...and the p75 prong closes the changed-gate masking hole: code
    // speedups covering half the suite can drag the ALL-shared median
    // under 1.0 on a 1.3x-drifted box, but the unchanged gates' 1.3x
    // ratios occupy the upper quartile — no bypass
    assert(db(0.116, 0.288, 0.95, Some((0.071, 0.273)), 1.30)
      == "refused_probe_rel")
    // ...and never overrides the absolute ceilings (a catastrophic
    // probe episode refuses regardless of the per-gate median)
    assert(db(0.30, 0.224, 0.869, Some((0.071, 0.273)), 1.03)
      == "refused_probe")
    // the r19 promotion shape (judge r19 #3): spark probe 0.057 vs the
    // committed file's 0.100 — a ~1.75x-healthier 32-way window whose
    // committed "improvement" conflates code and box. The symmetric
    // prong refuses it in both median regimes.
    assert(db(0.057, 0.302, 0.88, Some((0.100, 0.302)), 1.02)
      == "refused_probe_fast")
    assert(db(0.057, 0.302, 1.05, Some((0.100, 0.302)), 1.10)
      == "refused_probe_fast")
  }

  test("end-of-run heavy adjudication band: >2x drift-scaled baseline AND >2s") {
    // BENCH_r13's two unadjudicated spikes must both qualify now:
    // graph_pagerank_conv 9.64s vs 4.355s baseline (2.21x, clean box)
    assert(Bench.heavyRerunWorthy(9.64, Some(4.355), 1.0))
    // emb_ivfpq_build 11.13s vs 3.034s baseline (3.7x, formerly exempt)
    assert(Bench.heavyRerunWorthy(11.13, Some(3.034), 1.0))
    // a sub-2s wall never qualifies however large the ratio (jitter)
    assert(!Bench.heavyRerunWorthy(1.9, Some(0.2), 1.0))
    // at-2x is NOT over-2x (band is strict, matching the judge's ask)
    assert(!Bench.heavyRerunWorthy(8.0, Some(4.0), 1.0))
    // drift-scaled: a 1.5x box widens the band so a uniformly slow run
    // doesn't re-run every heavy gate
    assert(!Bench.heavyRerunWorthy(9.64, Some(4.355), 1.5))
    assert(Bench.heavyRerunWorthy(14.0, Some(4.355), 1.5))
    // no baseline entry -> no adjudication (new gates bill raw until
    // the next baseline promotion covers them)
    assert(!Bench.heavyRerunWorthy(100.0, None, 1.0))
  }

  test("baseline files are sf-keyed; sf0.1 keeps the historical name") {
    assert(Bench.baselineFileFor("/root/testdata/sf0.1") == "BENCH_FULL.json")
    assert(Bench.baselineFileFor("/root/repo/target/scratch/tmp_sf1")
      == "BENCH_FULL_sf1.json")
    assert(Bench.baselineFileFor("/root/testdata/sf0.01")
      == "BENCH_FULL_sf0.01.json")
  }

  test("min-merge: unchanged gates take min(committed, run); changed replace") {
    // the r15 poison shape: a legal write (median 1.116) inflating
    // unchanged rows — q25_sql_corr 0.512 → 2.225, dl_evenodd 1.053 →
    // 3.639 — must keep the committed walls; a changed gate's accepted
    // trade (simhash compat +0.3s) must still replace
    val committed = Map("q25_sql_corr" -> 0.512, "dl_evenodd" -> 1.053,
      "txt_simhash_pairs" -> 0.9)
    val run = Seq("q25_sql_corr" -> 2.225, "dl_evenodd" -> 3.639,
      "txt_simhash_pairs" -> 1.2, "new_gate" -> 0.4)
    val merged = Bench.minMergeRows(run, committed,
      changed = Set("txt_simhash_pairs")).toMap
    assert(merged("q25_sql_corr") == 0.512)
    assert(merged("dl_evenodd") == 1.053)
    assert(merged("txt_simhash_pairs") == 1.2, "changed gate replaces")
    assert(merged("new_gate") == 0.4, "gate new to the file bills raw")
    // a genuinely faster run still improves unchanged rows
    assert(Bench.minMergeRows(Seq("q25_sql_corr" -> 0.4), committed,
      Set.empty).toMap.apply("q25_sql_corr") == 0.4)
  }

  test("changed-gates file: trims, drops comments/blanks, missing file = empty") {
    val f = java.nio.file.Files.createTempFile("changed", ".txt")
    java.nio.file.Files.write(f,
      "# round 16\n\n  dl_evenodd  \ntxt_simhash_pairs\n".getBytes)
    assert(Bench.changedGates(f.toString)
      == Set("dl_evenodd", "txt_simhash_pairs"))
    assert(Bench.changedGates("/nonexistent/changed.txt") == Set.empty)
    java.nio.file.Files.delete(f)
  }

  test("subset writes judge against their own shared rows") {
    // the r15 sf1-subset poison: the full run's median (1.116, legal)
    // let the subset ride in while its OWN shared rows read ~1.19 with
    // dl_tc at 4.2x — judged against its own rows it must refuse
    val d = Bench.baselineWriteDecision(false, true, false,
      0.096, 0.306, 0.25, 0.32,
      medianRatio = 1.19, committedProbes = Some((0.096, 0.295)),
      p75Ratio = 2.0)
    assert(d == "refused_median")
  }

  test("measured-beats-derived: relative prongs waived against a --derive file") {
    // r16: the twice-derived sf1 file read ~0.90x the measured-clean
    // subset rows; a clean-probe measured run (0.072/0.305) refused on
    // median 1.17 against it. Against a DERIVED file the median and
    // probe_rel prongs are waived...
    def d(med: Double, cp: Option[(Double, Double)], derived: Boolean) =
      Bench.baselineWriteDecision(false, true, false, 0.072, 0.305,
        0.25, 0.32, med, cp, p75Ratio = 1.25, committedDerived = derived)
    assert(d(1.17, None, derived = true) == "ok")
    assert(d(1.17, Some((0.05, 0.25)), derived = true) == "ok")
    // ...but not against a measured file (the r15 protections hold)
    assert(d(1.17, None, derived = false) == "refused_median")
    // and the absolute ceilings/suspect/error prongs stay unconditional
    assert(Bench.baselineWriteDecision(false, true, false, 0.30, 0.305,
      0.25, 0.32, 1.0, None, 1.0, committedDerived = true) == "refused_probe")
    assert(Bench.baselineWriteDecision(true, true, false, 0.072, 0.305,
      0.25, 0.32, 1.0, None, 1.0, committedDerived = true) == "refused_suspect")
    assert(Bench.baselineWriteDecision(false, true, true, 0.072, 0.305,
      0.25, 0.32, 1.0, None, 1.0, committedDerived = true) == "refused_errors")
  }

  test("parseCommitted flags derived files and reports probes") {
    val f = java.nio.file.Files.createTempFile("walls", ".json")
    java.nio.file.Files.write(f,
      """{
        |  "dl_tc": 3.358,
        |  "total": 271.430,
        |  "baseline_write": "derived",
        |  "sf": "/x/tmp_sf1",
        |  "cpus": 32
        |}""".stripMargin.getBytes)
    val (rows, cfg, probes, derived) =
      Bench.parseCommitted(f.toString, "/x/tmp_sf1", "32")
    assert(cfg && derived && probes.isEmpty && rows == Map("dl_tc" -> 3.358))
    val (_, _, _, notDerived) =
      Bench.parseCommitted(f.toString, "/x/other", "32")
    assert(notDerived, "derived flag is independent of config match")
    java.nio.file.Files.delete(f)
    val (e, okCfg, _, d0) = Bench.parseCommitted(f.toString, "/x", "32")
    assert(e.isEmpty && okCfg && !d0, "missing file: first write allowed")
    // present-but-UNREADABLE committed file (ADVICE r16 #3): only a
    // genuinely missing file is "first promotion" — an IO failure on a
    // file that exists must refuse (configMatch=false routes the write
    // aside), not silently green-light an unmerged replacement
    val dir = java.nio.file.Files.createTempDirectory("walls-as-dir")
    val (e2, badCfg, _, d2) = Bench.parseCommitted(dir.toString, "/x", "32")
    assert(e2.isEmpty && !badCfg && !d2,
      "unreadable committed file must refuse, not count as first write")
    java.nio.file.Files.delete(dir)
  }

  test("sharedRatios: changed-gate exclusion for write adjudication") {
    // ADVICE r16 #2: an accepted perf trade on a listed changed gate
    // (3.0x here) must not skew the write median/p75; the errored and
    // sub-0.2s-baseline exclusions are unchanged
    val baseline = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "tiny" -> 0.1)
    val run = Seq("a" -> 1.0, "b" -> 1.1, "c" -> 3.0, "tiny" -> 9.9)
    assert(Bench.sharedRatios(run, baseline, Set.empty) == Seq(1.0, 1.1, 3.0))
    assert(Bench.sharedRatios(run, baseline, Set.empty, Set("c"))
      == Seq(1.0, 1.1))
    assert(Bench.sharedRatios(run, baseline, Set("b"), Set("c")) == Seq(1.0))
  }

  test("ScaleBench write decision: post-loop ceiling unconditional + relative prong") {
    def d(p: Double, pst: Double, pa: Double, psta: Double,
        cp: Option[(Double, Double)], cfg: Boolean = true) =
      ScaleBench.scaleWriteDecision(cfg, p, pst, pa, psta, 0.25, 0.32, cp)
    assert(d(0.10, 0.29, 0.10, 0.29, Some((0.098, 0.29))) == "ok")
    // config prong first (r16 review: a wrong-scale/cpus run must
    // never clobber the committed sf10 walls — Bench refuses the same)
    assert(d(0.10, 0.29, 0.10, 0.29, None, cfg = false) == "refused_config")
    // pre-loop ceiling
    assert(d(0.30, 0.29, 0.10, 0.29, None) == "refused_probe")
    // post-loop ceiling now fires even with zero errors (ADVICE r15
    // #3: a clean run on a box that degrades mid-run must not commit)
    assert(d(0.10, 0.29, 0.30, 0.29, None) == "refused_post_probe")
    assert(d(0.10, 0.29, 0.10, 0.40, None) == "refused_post_probe")
    // relative prong vs the committed file's own probes (1.15x)
    assert(d(0.12, 0.29, 0.12, 0.29, Some((0.098, 0.29)))
      == "refused_probe_rel")
    // ...judged on the BETTER of the two samples: the r16 shape — a
    // pre-loop JIT-churn reading (0.116) beside a clean post-loop
    // sample (0.086) must not refuse freshly-measured walls
    assert(d(0.116, 0.302, 0.086, 0.283, Some((0.098, 0.29))) == "ok")
    // a box dirty on BOTH samples still refuses
    assert(d(0.116, 0.302, 0.120, 0.301, Some((0.098, 0.29)))
      == "refused_probe_rel")
    // symmetric prong (judge r19 #3): a window >1.15x HEALTHIER than
    // the committed file's on both samples refuses too (box-neutral
    // committed deltas); one lucky sample beside a normal one is noise
    assert(d(0.057, 0.29, 0.060, 0.29, Some((0.100, 0.29)))
      == "refused_probe_fast")
    assert(d(0.057, 0.29, 0.098, 0.29, Some((0.100, 0.29))) == "ok")
    // no committed file yet: absolute ceilings alone govern
    assert(d(0.12, 0.29, 0.12, 0.29, None) == "ok")
    // errors prong (ADVICE r16 #4, mirroring Bench's refused_errors):
    // a session that killed a gate must not commit the survivors'
    // walls — they land aside with their err_ annotations, and
    // split/resume re-measures the dead gate on the next clean window
    assert(ScaleBench.scaleWriteDecision(true, 0.10, 0.29, 0.10, 0.29,
      0.25, 0.32, None, hasErrors = true) == "refused_errors")
    // errors outranks config (ADVICE r17 #4: prong order now mirrors
    // Bench.baselineWriteDecision, so the same failing run gets the
    // same provenance label from both mains)
    assert(ScaleBench.scaleWriteDecision(false, 0.10, 0.29, 0.10, 0.29,
      0.25, 0.32, None, hasErrors = true) == "refused_errors")
  }

  test("mergeSubsetRows: min-merge, carry, derived laundering guard, refused passthrough") {
    val gates = Seq("a", "b", "c", "d")
    val committed = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)
    val measured = Map("a" -> 1.5, "b" -> 1.5, "d" -> 0.4)
    // ok write vs a MEASURED file: unchanged min-merge, changed
    // replace, unmeasured carry, new gate raw
    val ok = Bench.mergeSubsetRows(gates, measured, committed,
      changed = Set("b"), writeOk = true, committedDerived = false).toMap
    assert(ok == Map("a" -> 1.0, "b" -> 1.5, "c" -> 3.0, "d" -> 0.4))
    // ok write vs a DERIVED file: never min-merge (a fabricated 1.0
    // would launder into a measured-looking file forever) and never
    // carry fabricated rows
    val der = Bench.mergeSubsetRows(gates, measured, committed,
      changed = Set.empty, writeOk = true, committedDerived = true).toMap
    assert(der == Map("a" -> 1.5, "b" -> 1.5, "d" -> 0.4))
    // refused write: raw measurements only (side file documents the
    // run, not the baseline)
    val ref = Bench.mergeSubsetRows(gates, measured, committed,
      changed = Set.empty, writeOk = false, committedDerived = false).toMap
    assert(ref == measured)
  }

  test("full-file min-merge base is empty against a derived committed file") {
    // the full-file write computes mergeBase = baseline only when the
    // committed file is NOT derived; pin the laundering scenario at
    // the minMergeRows level: merging against fabricated rows keeps
    // them, merging against empty keeps the measurement
    val fabricated = Map("g" -> 0.9) // derive-normalized, ~0.90x truth
    val run = Seq("g" -> 1.0) // clean-probe measured truth
    assert(Bench.minMergeRows(run, fabricated, Set.empty).toMap
      .apply("g") == 0.9, "min-merge WOULD launder — callers must gate")
    assert(Bench.minMergeRows(run, Map.empty, Set.empty).toMap
      .apply("g") == 1.0)
  }

  test("ScaleBench subset names resolve and the fixpoint family is probed") {
    val qs = SparkEntry.queries.keySet
    val missing = ScaleBench.subset.filterNot(qs)
    assert(missing.isEmpty, s"subset names not in queries: $missing")
    // judge r15 #6: monotonic + mmin-CC + pagerank two decades up
    assert(Set("dl_sssp", "dl_cc", "graph_pagerank_conv")
      .subsetOf(ScaleBench.subset.toSet))
  }

  test("bench_changed_gates.txt names resolve to registered queries") {
    // a typo'd name in the changed list is doubly wrong: the real gate
    // silently keeps min-merge (hiding an accepted regression) and the
    // phantom name matches nothing
    val listed = Bench.changedGates()
    val qs = SparkEntry.queries.keySet + "emb_ivfpq_build"
    val unknown = listed.filterNot(qs)
    assert(unknown.isEmpty, s"changed-gate names not in queries: $unknown")
  }

  test("every headline name resolves to a registered query") {
    // the metric line filters headline through the results map, so a
    // typo or a renamed gate would silently vanish from BENCH_r{N}.json
    val qs = SparkEntry.queries.keySet
    val missing = Bench.headline.filterNot(qs)
    assert(missing.isEmpty, s"headline names not in queries: $missing")
    assert(Bench.headline.distinct.size == Bench.headline.size,
      "duplicate headline names")
  }
}
