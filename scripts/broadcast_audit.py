"""Broadcast-hazard audit: flag keys whose EXECUTED plan broadcasts a
subtree containing a raw scan of a data-sized table with no
aggregate/limit between the scan and the BroadcastExchange.

This is the exact shape behind the round-9 finding: Catalyst's fixed
per-element width guess underestimates computed-array and exploded
frames, so the static planner can pick a corpus-sized hash build that
OOMs the driver at scale while passing every small-SF test (observed
on the containment path at 10× sf0.1). Run at each round close next to
scripts/plan_sweep.py; adjudicate any flag against the legitimate
classes (aggregate outputs, limits, cached bounded frames, dimension
tables) or pin a shuffle strategy on the offending join.

Usage: python scripts/broadcast_audit.py [sf_dir] [--slice i:j]
Default sf_dir: the generated decade probe at .scaledata/sf1 (hazards
show at scale; sf0.001 plans often broadcast legitimately). Audits the
batch keys of the timed bench series (streaming keys replay through
the harness and are exercised by driver_sim instead).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_TABLES = "documents|embeddings|events|lineitem|orders"
REDUCERS = r"HashAggregate|SortAggregate|ObjectHashAggregate|GlobalLimit|TakeOrdered|InMemory"


def subtree(lines: list[str], i: int) -> str:
    """The rendered plan subtree under line ``i`` (indent-delimited)."""
    indent = len(lines[i]) - len(lines[i].lstrip(" :+-"))
    out = []
    for line in lines[i + 1 :]:
        ind = len(line) - len(line.lstrip(" :+-"))
        if ind <= indent and line.strip():
            break
        out.append(line)
    return "\n".join(out)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else os.path.join(repo, ".scaledata", "sf1")
    )
    keys = sorted(json.load(open(os.path.join(repo, "bench_full.json")))["queries"])
    keys = [k for k in keys if not k.startswith("s") and k != "x_embed_jl_project"]
    if "--slice" in sys.argv:
        i, j = map(int, sys.argv[sys.argv.index("--slice") + 1].split(":"))
        keys = keys[i:j]

    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    reg = E.queries()
    flagged = errored = 0
    for name in keys:
        spark.catalog.clearCache()
        try:
            p = reg[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # audit artifact: report, keep sweeping
            print(f"  ERR {name}: {type(ex).__name__} {str(ex)[:120]}", flush=True)
            errored += 1
            continue
        lines = p.splitlines()
        for i, line in enumerate(lines):
            if "BroadcastExchange" not in line:
                continue
            sub = subtree(lines, i)
            scan = re.search(rf"Scan parquet .*({BIG_TABLES})", sub)
            if scan and not re.search(REDUCERS, sub):
                print(f"  FLAG {name}: broadcasts {scan.group(0)[:70]}", flush=True)
                flagged += 1
                break
    print(
        f"broadcast-audit: {len(keys)} keys, {flagged} flagged, "
        f"{errored} errored at {sf_dir}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
