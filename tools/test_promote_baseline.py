#!/usr/bin/env python3
"""Self-test for promote_baseline.py (run: python3 tools/test_promote_baseline.py).

Exercises the acceptance matrix in a temp directory: clean promotion,
probe refusal, drift refusal, config refusal, uniform-episode derive,
heavy-tail derive refusal, and the changed-gate exclusion in drift
estimation. Not wired into sbt (pure python tool test); exits non-zero
on any failure.
"""
import json, os, subprocess, sys, tempfile

TOOL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "promote_baseline.py")


def run(tmp, committed, candidate, args=()):
    if committed is not None:
        json.dump(committed, open(os.path.join(tmp, "BENCH_FULL.json"), "w"))
    elif os.path.exists(os.path.join(tmp, "BENCH_FULL.json")):
        os.remove(os.path.join(tmp, "BENCH_FULL.json"))
    json.dump(candidate, open(os.path.join(tmp, "cand.json"), "w"))
    p = subprocess.run([sys.executable, TOOL, "cand.json", *args],
                       cwd=tmp, capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def committed_base(n=20, val=1.0):
    d = {f"g{i:02d}": val for i in range(n)}
    d.update(probe_seconds=0.12, probe_st_seconds=0.27, total=n * val,
             sf="/root/testdata/sf0.1", cpus=32)
    return d


def candidate(scale=1.0, n=20, probes=(0.12, 0.27), extra=None):
    d = {f"g{i:02d}": scale for i in range(n)}
    d.update(probe_seconds=probes[0], probe_st_seconds=probes[1],
             total=n * scale, sf="/root/testdata/sf0.1", cpus=32)
    if extra:
        d.update(extra)
    return d


def main():
    fails = []

    def check(name, want_rc, rc, out, want_sub=None):
        ok = rc == want_rc and (want_sub is None or want_sub in out)
        print(("PASS" if ok else "FAIL"), name)
        if not ok:
            fails.append(name)
            print("  rc", rc, "out:", out.strip()[:400])

    with tempfile.TemporaryDirectory() as tmp:
        # 1. clean run promotes
        rc, out = run(tmp, committed_base(), candidate(1.05))
        check("clean promotion", 0, rc, out, "PROMOTED")
        promoted = json.load(open(os.path.join(tmp, "BENCH_FULL.json")))
        check("promoted marker", 0,
              0 if promoted.get("baseline_write") == "promoted" else 1, "")

        # 2. degraded probes refuse
        rc, out = run(tmp, committed_base(), candidate(1.05, probes=(0.12, 0.40)))
        check("probe refusal", 1, rc, out, "degraded episode")

        # 3. drift refusal
        rc, out = run(tmp, committed_base(), candidate(1.5))
        check("drift refusal", 1, rc, out, "median drift")

        # 4. config refusal
        cand = candidate(1.0)
        cand["cpus"] = 16
        rc, out = run(tmp, committed_base(), cand)
        check("config refusal", 1, rc, out, "config mismatch")

        # 5. uniform degraded episode derives (1.5x everywhere)
        rc, out = run(tmp, committed_base(), candidate(1.5), ["--derive"])
        check("uniform derive", 0, rc, out, "DERIVED")
        derived = json.load(open(os.path.join(tmp, "BENCH_FULL.json")))
        v = derived.get("g00")
        check("derived values normalized", 0,
              0 if abs(v - 1.0) < 0.01 else 1, f"g00={v}")
        check("derived marker", 0,
              0 if derived.get("baseline_write") == "derived" else 1, "")

        # 6. heavy-tailed episode refuses to derive (half 1.2x, half 2.2x)
        cand = candidate(1.2)
        for i in range(10):
            cand[f"g{i:02d}"] = 2.2
        rc, out = run(tmp, committed_base(), cand, ["--derive"])
        check("heavy-tail derive refusal", 1, rc, out, "heavy-tailed")

        # 7. changed-gate families are excluded from drift estimation:
        # stream_* at wild ratios must not affect the uniform verdict
        com = committed_base()
        com.update({f"stream_x{i}": 1.0 for i in range(6)})
        cand = candidate(1.5, extra={f"stream_x{i}": 8.0 for i in range(6)})
        rc, out = run(tmp, com, cand, ["--derive"])
        check("changed-gate exclusion", 0, rc, out, "DERIVED")

        # 8. a candidate carrying an errors block is refused on both
        # paths (ADVICE r13 #1): an errored query's time-to-failure wall
        # must never become its committed baseline
        cand = candidate(1.05, extra={
            "errors": {"dl_tc": "SparkException: boom"}, "dl_tc": 0.05})
        rc, out = run(tmp, committed_base(), cand)
        check("errors-block promote refusal", 1, rc, out, "errors block")
        rc, out = run(tmp, committed_base(), cand, ["--derive"])
        check("errors-block derive refusal", 1, rc, out, "errors block")

        # 9. the promote-path drift gate excludes CHANGED families too
        # (ADVICE r13 #2): an intentional 3x change to stream_* must not
        # push the unchanged-gate median over DRIFT_MAX
        com = committed_base()
        com.update({f"stream_x{i}": 1.0 for i in range(15)})
        cand = candidate(1.02, extra={f"stream_x{i}": 3.0 for i in range(15)})
        rc, out = run(tmp, com, cand)
        check("promote drift ignores changed families", 0, rc, out, "PROMOTED")

        # 10. emb_ivfpq_build is a first-class row: preserved by promote,
        # normalized by derive (judge r13 #1a — no more baseline blind
        # spot for the build row)
        com = committed_base()
        com["emb_ivfpq_build"] = 3.0
        cand = candidate(1.05, extra={"emb_ivfpq_build": 3.1})
        rc, out = run(tmp, com, cand)
        check("build row promoted", 0, rc, out, "PROMOTED")
        promoted = json.load(open(os.path.join(tmp, "BENCH_FULL.json")))
        check("build row present after promote", 0,
              0 if promoted.get("emb_ivfpq_build") == 3.1 else 1, "")
        cand = candidate(1.5, extra={"emb_ivfpq_build": 4.5})
        rc, out = run(tmp, com, cand, ["--derive"])
        check("build row derive", 0, rc, out, "DERIVED")
        derived = json.load(open(os.path.join(tmp, "BENCH_FULL.json")))
        v = derived.get("emb_ivfpq_build")
        check("build row normalized by derive", 0,
              0 if v is not None and abs(v - 3.0) < 0.01 else 1,
              f"emb_ivfpq_build={v}")

        # 11. relative probe prong (judge r14 #1): probes under the
        # absolute ceilings but >1.15x the committed file's own recorded
        # probes refuse — the r14 final-run shape (0.116 vs 0.071)
        rc, out = run(tmp, committed_base(), candidate(1.05, probes=(0.15, 0.27)))
        check("relative probe refusal", 1, rc, out, "1.15x")
        rc, out = run(tmp, committed_base(), candidate(1.05, probes=(0.12, 0.32)))
        check("relative probe_st refusal", 1, rc, out, "1.15x")
        # within 1.15x of the committed probes still promotes
        rc, out = run(tmp, committed_base(), candidate(1.05, probes=(0.13, 0.28)))
        check("within-band probes promote", 0, rc, out, "PROMOTED")
        # faster-than-baseline bypass (r15, mirrored from Bench): a
        # shared-gate median strictly under 1.0 cannot be a worse
        # measurement — out-of-band probes don't refuse it
        rc, out = run(tmp, committed_base(), candidate(0.87, probes=(0.15, 0.27)))
        check("median<1 bypasses relative probe prong", 0, rc, out, "PROMOTED")
        # ...but absolute probe ceilings stay unconditional
        rc, out = run(tmp, committed_base(), candidate(0.87, probes=(0.30, 0.27)))
        check("absolute ceiling overrides bypass", 1, rc, out,
              "degraded episode")

        # 11b. measured-beats-derived (r16): the drift-median gate is
        # waived when the file being replaced is a --derive estimate
        # (its rows are normalized guesses; r16 measured the sf1 derive
        # at ~0.90x the measured-clean subset, so a real clean-probe run
        # read median 1.17 against it and was wrongly frozen out)
        com = committed_base()
        com["baseline_write"] = "derived"
        rc, out = run(tmp, com, candidate(1.17))
        check("derived file: drift gate waived", 0, rc, out, "PROMOTED")
        check("derived waiver is logged", 0, rc, out, "drift gate waived")
        # the same 1.17 median against a MEASURED file still refuses
        rc, out = run(tmp, committed_base(), candidate(1.17))
        check("measured file keeps drift gate", 1, rc, out, "median drift")
        # absolute probe ceilings still refuse against a derived file
        com = committed_base()
        com["baseline_write"] = "derived"
        rc, out = run(tmp, com, candidate(1.0, probes=(0.30, 0.27)))
        check("derived file: absolute ceiling holds", 1, rc, out,
              "degraded episode")

        # 12. first-time promotion (no committed file) validates the
        # candidate's sf against the --out filename (ADVICE r14): an
        # sf0.1 candidate must not seed BENCH_FULL_sf1.json
        rc, out = run(tmp, None, candidate(1.0),
                      ["--out", "BENCH_FULL_sf1.json"])
        check("first-promotion wrong-scale refusal", 1, rc, out,
              "wrong-scale first promotion")
        rc, out = run(tmp, None, candidate(1.0))
        check("first-promotion matching scale ok", 0, rc, out, "PROMOTED")
        sf1 = candidate(1.0)
        sf1["sf"] = "/root/repo/target/scratch/tmp_sf1"
        if os.path.exists(os.path.join(tmp, "BENCH_FULL.json")):
            os.remove(os.path.join(tmp, "BENCH_FULL.json"))
        json.dump(sf1, open(os.path.join(tmp, "cand.json"), "w"))
        p = subprocess.run([sys.executable, TOOL, "cand.json",
                            "--out", "BENCH_FULL_sf1.json"],
                           cwd=tmp, capture_output=True, text=True)
        check("first-promotion tmp_sf1 keys to sf1 file", 0, p.returncode,
              p.stdout + p.stderr, "PROMOTED")
        rc, out = run(tmp, None, candidate(1.0),
                      ["--out", "BENCH_FULL_sf1.json", "--new-config"])
        check("first-promotion --new-config override", 0, rc, out, "PROMOTED")

    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("all promote_baseline self-tests passed")


if __name__ == "__main__":
    main()
