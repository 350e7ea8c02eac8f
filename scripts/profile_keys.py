"""Per-key cost breakdown: plan build vs analysis vs run1 vs run2.

Optimization-round instrument (guide §1): separates driver-side cost
(Python plan construction + Catalyst analysis) from executor cost
(first noop run pays codegen/JIT; second run is steady state — the
number bench.py's best-of-2 reports). Usage:

    python scripts/profile_keys.py <key> [<key> ...]
    python scripts/profile_keys.py --all-over 2.0   # keys over 2 s in bench_full.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="profile-keys")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    args = sys.argv[1:]
    if args and args[0] == "--all-over":
        thr = float(args[1])
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_full.json")) as fh:
            full = json.load(fh)
        keys = [k for k, v in sorted(full["queries"].items(), key=lambda kv: -kv[1]) if v >= thr]
    else:
        keys = args
    print(f"{'key':32s} {'build':>7s} {'analyze':>8s} {'run1':>7s} {'run2':>7s}")
    for name in keys:
        if name not in registry:
            print(f"{name:32s}  MISSING")
            continue
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = registry[name](spark, SF_DIR)
        t1 = time.time()
        df.schema  # force analysis
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.time()
        print(
            f"{name:32s} {t1 - t0:7.2f} {t2 - t1:8.2f} {t3 - t2:7.2f} {t4 - t3:7.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
