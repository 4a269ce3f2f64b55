#!/usr/bin/env python3
"""Promote a bench side-file (BENCH_FULL_SUSPECT.json) to the committed
per-query baseline (BENCH_FULL.json), enforcing the acceptance criteria
the judge set for baseline refreshes (VERDICT r12 #1):

  - the run's own fixed-work probes are clean-box grade
    (probe_seconds <= PROBE_MAX, probe_st_seconds <= PROBE_ST_MAX —
    same ceilings Bench.scala uses to gate its own committed writes);
  - median drift vs the CURRENT committed baseline's shared entries
    (>0.2s, non-meta) is <= DRIFT_MAX;
  - sf and cpus match the committed baseline (or --new-config).

On success writes BENCH_FULL.json with the env_suspect/suspect fields
stripped and baseline_write set to "promoted". Never edits in place on
failure. Usage:

  python3 tools/promote_baseline.py [BENCH_FULL_SUSPECT.json] [--new-config]
"""
import json, os, re, sys

PROBE_MAX = float(os.environ.get("SPARK_GRAFT_PROBE_MAX", "0.25"))
PROBE_ST_MAX = float(os.environ.get("SPARK_GRAFT_PROBE_ST_MAX", "0.32"))
DRIFT_MAX = float(os.environ.get("SPARK_GRAFT_DRIFT_MAX", "1.1"))

META = re.compile(r"(__alt$|__pos$|^probe_|^total$|^emb_ivfpq_build$|"
                  r"^median_ratio$|^sf$|^cpus$)")


def query_map(d):
    return {k: v for k, v in d.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            and not META.search(k)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "BENCH_FULL_SUSPECT.json"
    new_config = "--new-config" in sys.argv
    cand = json.load(open(src))
    probs = []

    p, pst = cand.get("probe_seconds"), cand.get("probe_st_seconds")
    if p is None or pst is None:
        probs.append("candidate carries no calibration probes")
    else:
        if p > PROBE_MAX:
            probs.append(f"probe_seconds {p} > {PROBE_MAX} (degraded episode)")
        if pst > PROBE_ST_MAX:
            probs.append(f"probe_st_seconds {pst} > {PROBE_ST_MAX} (degraded episode)")

    try:
        cur = json.load(open("BENCH_FULL.json"))
    except FileNotFoundError:
        cur = None
    if cur is not None:
        if not new_config and (cand.get("sf") != cur.get("sf")
                               or cand.get("cpus") != cur.get("cpus")):
            probs.append(
                f"config mismatch: candidate {cand.get('sf')}/{cand.get('cpus')} "
                f"vs committed {cur.get('sf')}/{cur.get('cpus')} "
                "(pass --new-config to retarget)")
        cm, xm = query_map(cur), query_map(cand)
        ratios = sorted(xm[k] / cm[k] for k in cm.keys() & xm.keys()
                        if cm[k] > 0.2)
        if ratios:
            med = ratios[len(ratios) // 2]
            print(f"shared entries: {len(ratios)}, median drift {med:.3f}")
            if med > DRIFT_MAX:
                probs.append(f"median drift {med:.3f} > {DRIFT_MAX} "
                             "vs committed shared entries")

    if probs:
        print("REFUSED:")
        for x in probs:
            print(" -", x)
        sys.exit(1)

    for k in ("env_suspect", "median_ratio", "suspect_queries"):
        cand.pop(k, None)
    cand["baseline_write"] = "promoted"
    with open("BENCH_FULL.json", "w") as f:
        json.dump(cand, f, indent=1, sort_keys=False)
        f.write("\n")
    n = len(query_map(cand))
    print(f"PROMOTED {src} -> BENCH_FULL.json ({n} query entries, "
          f"probes {p}/{pst}, sf={cand.get('sf')}, cpus={cand.get('cpus')})")


if __name__ == "__main__":
    main()
