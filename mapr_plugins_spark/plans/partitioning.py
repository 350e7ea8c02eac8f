"""Partitioning posture helpers.

``fan_out`` fixes the one case where Catalyst cannot help: a CPU-heavy
projection (minhash over exploded shingles, Arrow-batched pandas UDFs,
per-token hashing) fused into a scan stage that has too few input
splits. Parquet splits at row-group boundaries, so a single-row-group
file yields one task no matter how many cores exist — the expensive
narrow work then runs serially.

At cluster scale against 100 TB the input arrives as ~100k splits and
``fan_out`` is a no-op (the partition count already exceeds the session
parallelism, so no shuffle is added). On skinny inputs it inserts one
round-robin exchange *before* the expensive work, trading a cheap
shuffle of the raw bytes for full-width parallelism of the compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer
    partitions than the session's parallelism. Call it on the *narrow*
    input (ids + payload column) right before a CPU-heavy projection."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
