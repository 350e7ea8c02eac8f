"""One-decade scale probe: time a key list at an arbitrary sf dir.

Companion to bench.py (same best-of-2 / noop-sink / clearCache
protocol) for the SCALE.md sf-curves — run against the
scripts/gen_scale.py output to extend every curve one decade past the
driver-shipped sf0.1.

Usage: python scripts/scale_probe.py <sf_dir> [key1,key2,...]
Default keys: the ten heaviest operators per the round-6 bench record.
Prints one JSON line {"sf_dir": ..., "queries": {key: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "x_dedup_containment",
    "x_triangle_count",
    "x_graph_kcore",
    "x_pagerank",
    "x_blocking_recall",
    "x_setsim_join",
    "s18_stream_cms",
    "x_ann_ivfpq_indexed",
    "x_bpe_encode",
    "x_curate",
]


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_KEYS

    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    timings: dict[str, float] = {}
    for name in keys:
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
