#!/usr/bin/env python3
"""Per-query-MIN composite bench: run graft.Bench N times (default 3,
each run itself 5-sample min per query) and write ONE total-metric
line whose per-query values are the min across runs — the artifact
format bench_guard.py anchors on (BENCH_LOCAL_r*_sf01.json).

On this host the noise is partly calib-invisible (IO/memory contention
leaves the CPU probe flat while queries run slower), so a single run's
mins can all be contaminated by one loud window; the cross-run min is
the credible steady-state number. calib_start/calib_end in the output
are the PAIR from the single quietest run (minimal mean) — never
per-field minima mixed across runs, which would pair probes from
different load regimes and skew bench_guard's drift normalization.

Usage:
  python3 tools/bench_composite.py [sfDir] [--runs=3] [--out=path]
"""
import json, os, re, subprocess, sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF = next((a for a in sys.argv[1:] if not a.startswith("--")), "/root/testdata/sf0.1")
RUNS = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--runs=")), "3"))
OUT = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--out=")), None)


def one_run(i):
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], cwd=REPO, capture_output=True,
        text=True, env={**os.environ, "SPARK_GRAFT_SF_DIR": SF, "SPARK_GRAFT_CPUS": "32"})
    out = r.stdout + r.stderr
    lines = [json.loads(m) for m in re.findall(r'\{"metric":.*\}', out)]
    totals = [l for l in lines if l.get("metric") == "total" and "queries" in l]
    # prefer a line carrying calib fields inline; past ~155 queries the
    # final JSON line goes LEAN to fit Bench's 1870-byte consumer budget
    # and the calib pair lives only on the prefixed BENCH_CALIB
    # diagnostic line — fall back to parsing that
    with_calib = [l for l in totals if "calib_start" in l]
    if r.returncode != 0 or not totals:
        print("\n".join(out.splitlines()[-20:]))
        sys.exit(f"bench run {i} failed rc={r.returncode}")
    t = (with_calib or totals)[0]  # the full-precision (f3) line comes first
    if "calib_start" not in t:
        m = re.search(r"BENCH_CALIB start=([0-9.]+) end=([0-9.]+)", out)
        if not m:
            sys.exit(f"bench run {i}: no calib fields and no BENCH_CALIB line")
        t["calib_start"], t["calib_end"] = float(m.group(1)), float(m.group(2))
        # the lean line may be a rounded tier (fsig/f1: ~2 significant
        # digits); BENCH_FULL carries every query at f3 under its FULL
        # name — re-key it to the lean line's short ids so the artifact
        # keys stay stable for bench_guard, but the values are exact
        mf = re.search(r"BENCH_FULL (\{.*\})", out)
        remapped_ok = False
        if mf:
            full = json.loads(mf.group(1))
            pref = {k: k.split("_", 1)[0] for k in full}
            counts = {}
            for p in pref.values():
                counts[p] = counts.get(p, 0) + 1
            short = {k: (p if counts[p] == 1 else k) for k, p in pref.items()}
            remapped = {short[k]: v for k, v in full.items()}
            if set(remapped) == set(t["queries"]):
                t["queries"] = remapped
                t["value"] = round(sum(remapped.values()), 3)
                remapped_ok = True
        if not remapped_ok:
            # never silently record the lean line's rounded tier
            # (fsig/f1, ~2 significant digits) as if it were exact
            print(f"WARNING run {i}: BENCH_FULL remap "
                  f"{'missing' if not mf else 'key-mismatched vs lean line'} — "
                  f"keeping ROUNDED per-query values from the lean tier",
                  file=sys.stderr)
        # the lean line drops `samples`; recover it from the BENCH_CALIB
        # diagnostic line (Bench prints exactly ONE {"metric":...} line,
        # so there is no other JSON carrier to scan)
        if "samples" not in t:
            ms = re.search(r"BENCH_CALIB .*\bsamples=(\d+)", out)
            if ms:
                t["samples"] = int(ms.group(1))
    print(f"run {i}: total {t['value']:.1f}s calib "
          f"{t['calib_start']:.2f}->{t['calib_end']:.2f} loud={t.get('loud_window')}")
    return t


def main():
    runs = [one_run(i + 1) for i in range(RUNS)]
    keys = set()
    for t in runs:
        keys |= set(t["queries"])
    comp = {k: min(float(t["queries"][k]) for t in runs if k in t["queries"])
            for k in sorted(keys)}
    out = {
        "metric": "total", "value": round(sum(comp.values()), 2), "unit": "sec",
        "keys": "query id prefix",
        "queries": {k: round(v, 3) for k, v in comp.items()},
        # omit rather than record null — a "samples": null artifact
        # contradicts the documented 5-sample protocol
        **({"samples": runs[0]["samples"]} if runs[0].get("samples") is not None
           else {}),
        "runs": RUNS,
        # the (calib_start, calib_end) PAIR comes from the single
        # quietest run (minimal mean), never per-field minima across
        # runs — mixing probes from different runs would skew
        # bench_guard's load-drift normalization that anchors on them
        **(lambda q: {"calib_start": float(q["calib_start"]),
                      "calib_end": float(q["calib_end"])})(
            min(runs, key=lambda t: (float(t["calib_start"]) +
                                     float(t["calib_end"])) / 2.0)),
        "sf": SF,
    }
    dest = Path(OUT) if OUT else REPO / "BENCH_LOCAL_composite.json"
    dest.write_text(json.dumps(out, separators=(",", ":")) + "\n")
    print(f"composite total {out['value']}s over {len(comp)} queries -> {dest}")


if __name__ == "__main__":
    main()
