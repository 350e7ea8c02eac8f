"""Round-14 close-out: median-of-3 bench at the optimized HEAD, paired
against the round-13 close medians (BENCH_pair_r13.json `median_of_3`,
taken at the r13 final HEAD = this round's baseline code) →
BENCH_pair_r14.json. Methodology identical to bench.py (entry warm-up,
clearCache per key, best-of-2 per key per run); three fresh-JVM runs
by invoking bench.py three times and reading bench_full.json after
each.

Usage: python scripts/bench_pair_r14.py run   # one bench run, appends
       python scripts/bench_pair_r14.py finish  # compute medians + write
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACC = os.path.join(ROOT, "BENCH_pair_r14_runs.json")


def main() -> None:
    mode = sys.argv[1]
    if mode == "run":
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        with open(os.path.join(ROOT, "bench_full.json")) as fh:
            full = json.load(fh)
        runs = []
        if os.path.exists(ACC):
            runs = json.load(open(ACC))
        runs.append({"suite": full["value"], "queries": full["queries"]})
        json.dump(runs, open(ACC, "w"))
        print(f"run {len(runs)}: suite {full['value']}")
        return
    runs = json.load(open(ACC))
    r13 = json.load(open(os.path.join(ROOT, "BENCH_pair_r13.json")))
    base = r13["median_of_3"]  # r13 CLOSE medians = this round's baseline code
    med = {
        k: round(statistics.median([r["queries"][k] for r in runs]), 3)
        for k in runs[0]["queries"]
    }
    common = sorted(set(base) & set(med))
    base_sum = round(sum(base[k] for k in common), 3)
    now_sum = round(sum(med[k] for k in common), 3)
    ratios = []
    for r in runs:
        for k in runs[0]["queries"]:
            vals = [x["queries"][k] for x in runs]
            ratios.append(max(vals) / max(1e-9, min(vals)))
    ratios = sorted(set(ratios))
    out = {
        "sf": 0.1,
        "head": "OPTIMIZED round-14 HEAD (streaming fold density + foreachBatch "
                "sizing, s22/s23 Python-boundary, decontaminate fan_out, lazy "
                "pagerank rounds, s17/s26 explode-free totals)",
        "n": len(med),
        "suite_wall_sec": [r["suite"] for r in runs],
        "noise_stats": {
            "median_ratio": round(statistics.median(ratios), 3),
            "p90_ratio": round(sorted(ratios)[int(0.9 * (len(ratios) - 1))], 3),
            "max_ratio": round(max(ratios), 3),
            "note": "per-key max/min across the 3 same-HEAD runs",
        },
        "median_of_3": med,
        "baseline": {
            "head": "round-13 close HEAD (dada9f6/96a894b) — medians copied from "
                    "BENCH_pair_r13.json median_of_3 (same methodology, same host "
                    "class); cross-checked by this round's fresh single-run "
                    "baseline bench_full.json @ 322.9 s committed in 1bdf5d7",
            "suite_wall_sec": r13["suite_wall_sec"],
            "median_of_3": base,
        },
        "comparison": {
            "common_keys": len(common),
            "baseline_median_sum": base_sum,
            "optimized_median_sum": now_sum,
            "ratio": round(now_sum / base_sum, 4),
        },
        "run1": runs[0]["queries"],
        "run2": runs[1]["queries"],
        "run3": runs[2]["queries"],
    }
    json.dump(out, open(os.path.join(ROOT, "BENCH_pair_r14.json"), "w"), indent=1)
    print(json.dumps(out["comparison"], indent=1))
    movers = sorted(common, key=lambda k: med[k] - base[k])
    for k in movers[:12]:
        print(f"  {k:36s} {base[k]:7.2f} -> {med[k]:7.2f}")
    print("  ... worst:")
    for k in movers[-5:]:
        print(f"  {k:36s} {base[k]:7.2f} -> {med[k]:7.2f}")


if __name__ == "__main__":
    main()
