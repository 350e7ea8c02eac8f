"""Dump .explain('formatted') for named keys into plans/r13/<key>_<tag>.txt.

Usage: python scripts/dump_r13_plans.py <before|after> <key> [<key> ...]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from contextlib import redirect_stdout

    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="dump-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    tag = sys.argv[1]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in sys.argv[2:]:
        df = registry[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
