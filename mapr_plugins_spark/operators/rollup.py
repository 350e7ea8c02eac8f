"""Hypertable-style multi-granularity time rollup.

A time-series "hypertable" serves the same aggregate at several bucket
widths (hour/day/month dashboards). The naive build is one scan + one
shuffle PER granularity; this operator computes every granularity in a
single pass using grouping sets — Catalyst plans one Expand (one output
row per granularity per input row) feeding ONE partial+final aggregate,
so the corpus is scanned once and shuffled once regardless of how many
granularities are requested. At 100 TB that is the difference between
N full shuffles and one.

The rollup output is itself mergeable: buckets are additive (count /
decimal sum), so finer granularities can be folded into coarser ones
incrementally (the continuous-aggregate maintenance pattern) without
touching raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Granularities supported by date_trunc on both engines.
GRANULARITIES = ("hour", "day", "week", "month")


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grans: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """(gran, bucket_us, n, sum_val) for every requested granularity,
    computed in one scan + one shuffle via grouping sets.

    ``bucket_us`` is epoch microseconds (engine-portable); ``sum_val``
    accumulates in DECIMAL(18,6) so results are shuffle-order-free.
    """
    unknown = [g for g in grans if g not in GRANULARITIES]
    if unknown:
        raise ValueError(f"unknown granularities {unknown}; supported: {GRANULARITIES}")
    buckets = [F.date_trunc(g, F.col(ts_col)).alias(f"g_{g}") for g in grans]
    base = events.select(*buckets, F.col(value_col))
    cols = [f"g_{g}" for g in grans]
    agg = base.groupingSets([[c] for c in cols], *cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sv"),
    )
    gran = F.coalesce(
        *[F.when(F.col(f"g_{g}").isNotNull(), F.lit(g)) for g in grans]
    )
    return agg.select(
        gran.alias("gran"),
        F.unix_micros(F.coalesce(*[F.col(c) for c in cols])).alias("bucket_us"),
        "n",
        F.col("sv").cast("double").alias("sum_val"),
    )
