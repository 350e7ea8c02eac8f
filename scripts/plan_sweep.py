"""Plan-hazard sweep: scan every batch registry key's physical plan
for cartesian / broadcast-nested-loop joins.

Evidence artifact for SCALE.md's "no data-sized nested-loop join"
claim — run at each round close and adjudicate every flagged key
against the two documented-legitimate classes (1-row scalar attaches,
bounded probe/eval sides).

Usage: python scripts/plan_sweep.py [sf_dir]   (default sf0.001)
Prints one line per flagged key, then a summary count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from mapr_plugins_spark.plans.audit import has_cartesian
    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    flagged, errored, n = [], [], 0
    for name, fn in registry.items():
        if name.startswith("s"):  # streaming keys: plans are per-batch
            continue
        n += 1
        try:
            df = fn(spark, sf_dir)
            if has_cartesian(df):
                flagged.append(name)
                print(f"  FLAG {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errored.append(name)
            print(f"  ERR  {name}: {type(exc).__name__}", flush=True)
        finally:
            spark.catalog.clearCache()
    print(
        f"plan-sweep: {n} batch keys, {len(flagged)} flagged, "
        f"{len(errored)} errored at {sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
