"""Bench a subset of registry keys with bench.py's exact methodology
(warm-up, best-of-2, noop sink) — the optimization round's A/B
instrument. Full-suite numbers still come from bench.py.

Usage:
    python scripts/bench_subset.py <key> [<key> ...]
    python scripts/bench_subset.py --prefix s         # all streaming keys
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    args = sys.argv[1:]
    if args and args[0] == "--prefix":
        keys = sorted(k for k in registry if k.startswith(args[1]))
    else:
        keys = args

    _run(E.entry(spark).limit(1))
    timings: dict[str, float] = {}
    for name in keys:
        if name not in registry:
            print(f"{name}: MISSING", flush=True)
            continue
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"bench-subset:{name}")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _run(registry[name](spark, SF_DIR))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", flush=True)
    print(json.dumps({"total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
