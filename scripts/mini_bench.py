"""Best-of-2 bench-methodology timing for named keys (A/B instrument).

Same measurement as bench.py (entry warm-up, clearCache per key, two
full build+noop cycles, best kept) but for an explicit key list, so a
working-tree change can be A/B'd against HEAD in minutes:

    python scripts/mini_bench.py <key> [<key> ...]
    git stash && python scripts/mini_bench.py <key> && git stash pop

Round-13 lesson: single runs on this host move up to 2-6x between
same-HEAD executions — interleave (or at least run back-to-back within
minutes) and NEVER quote a mini-bench number against bench_full.json
or profile_keys.py output (JIT warm-up differs per harness).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="mini-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    E.entry(spark).limit(1).write.format("noop").mode("overwrite").save()
    for name in sys.argv[1:]:
        if name not in registry:
            print(f"{name:32s}  MISSING", flush=True)
            continue
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            registry[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{name:32s} best-of-2 {best:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
