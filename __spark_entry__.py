"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``mapr_plugins_spark`` package; this
module is a thin registry over it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launched us from.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation
    (3-way join + exact-decimal aggregation + sort)."""
    from mapr_plugins_spark import queries as Q

    return Q.q03_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mapr_plugins_spark import queries as Q

    reg: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in vars(Q).items():
        if callable(fn) and name.startswith("q") and getattr(fn, "__module__", "").endswith(
            "queries"
        ):
            reg[name] = fn
    try:
        from mapr_plugins_spark.operators.registry import extension_queries

        reg.update(extension_queries())
    except ImportError:
        pass
    try:
        from mapr_plugins_spark.streaming.registry import streaming_queries

        reg.update(streaming_queries())
    except ImportError:
        pass
    try:
        from mapr_plugins_spark.sources.registry import format_queries

        reg.update(format_queries())
    except ImportError:
        pass
    return reg


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys → rows-only check)."""
    from mapr_plugins_spark.oracles import RELATIONAL_ORACLES

    out = dict(RELATIONAL_ORACLES)
    try:
        from mapr_plugins_spark.operators.registry import extension_oracles

        out.update(extension_oracles())
    except ImportError:
        pass
    try:
        from mapr_plugins_spark.streaming.registry import streaming_oracles

        out.update(streaming_oracles())
    except ImportError:
        pass
    try:
        from mapr_plugins_spark.sources.registry import format_oracles

        out.update(format_oracles())
    except ImportError:
        pass
    return out
