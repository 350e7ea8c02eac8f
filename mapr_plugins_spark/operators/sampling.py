"""Deterministic sampling & dataset splitting by content hash.

Training-data pipelines need splits and samples that are (a) stable
across reruns and cluster layouts, (b) reproducible from the data
itself, and (c) consistent when the corpus grows (a document keeps its
assignment forever). Random-number sampling (``df.sample``,
``randomSplit``) gives none of that — results depend on partitioning
and seed plumbing. Hash-based assignment gives all three: bucket =
portable_hash(key, seed) mod N is a pure function of the row key.

Built on the engine's portable 60-bit md5 hash
(functions/portable_hash.py), so the DuckDB oracle reproduces every
assignment bit-for-bit — the split itself is oracle-checked, not just
its size. Per-row work is one md5 inside codegen; zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapr_plugins_spark.functions.portable_hash import with_seeded_hash60


def hash_bucket(df: DataFrame, key_sql: str, n_buckets: int = 100, seed: int = 7) -> DataFrame:
    """Append ``bucket`` = portable_hash(key, seed) mod n_buckets."""
    out = with_seeded_hash60(df, "__h", key_sql, str(seed))
    return out.withColumn("bucket", F.pmod(F.col("__h"), F.lit(n_buckets)).cast("int")).drop(
        "__h"
    )


def hash_split(
    df: DataFrame,
    key_sql: str,
    train_pct: int = 80,
    seed: int = 7,
) -> DataFrame:
    """Deterministic train/test split: ``split`` column ('train'/'test')
    assigned by content-hash bucket. A row's assignment never changes as
    the corpus grows, and holdout contamination is impossible to
    introduce by re-partitioning."""
    b = hash_bucket(df, key_sql, 100, seed)
    return b.withColumn(
        "split", F.when(F.col("bucket") < train_pct, "train").otherwise("test")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_sql: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 11,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep-fractions
    applied through the same content-hash buckets (a row's fate depends
    only on its key and its stratum's rate — stable under reruns,
    repartitioning, and corpus growth). The rate lookup is a codegen'd
    CASE; zero shuffle, zero Python."""
    b = hash_bucket(df, key_sql, n_buckets, seed)
    keep = F.lit(int(round(default_rate * n_buckets)))
    for stratum, rate in sorted(rates.items()):
        keep = F.when(F.col(strata_col) == stratum, int(round(rate * n_buckets))).otherwise(
            keep
        )
    return b.filter(F.col("bucket") < keep).drop("bucket")


def hash_sample(
    df: DataFrame,
    key_sql: str,
    fraction: float,
    seed: int = 7,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket falls
    below fraction·n_buckets. Same row set on every run and engine."""
    keep = int(round(fraction * n_buckets))
    b = hash_bucket(df, key_sql, n_buckets, seed)
    return b.filter(F.col("bucket") < keep).drop("bucket")


def weighted_hash_sample(
    df: DataFrame,
    key_sql: str,
    weight_col: str,
    seed: int = 13,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its hash
    bucket < weight·n_buckets, so acceptance probability equals the
    per-row ``weight_col`` in [0,1] (quality scores, dedup-cluster
    downweights, curriculum temperatures). Pure codegen'd expressions —
    zero shuffle, same row set on every run and engine."""
    b = hash_bucket(df, key_sql, n_buckets, seed)
    return b.filter(
        F.col("bucket") < (F.col(weight_col) * n_buckets).cast("int")
    ).drop("bucket")


def rebalance_sources(
    df: DataFrame,
    key_sql: str,
    source_col: str,
    seed: int = 17,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Downsample over-represented sources to the size of the SMALLEST
    source (the equal-share domain-mixing baseline): acceptance rate per
    source = min_count / source_count, applied through deterministic
    hash buckets. One metadata-sized count aggregate broadcasts back as
    a rate column; the filter itself is row-local."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    mn = counts.agg(F.min("__n").alias("__mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        source_col,
        (F.col("__mn").cast("double") / F.col("__n")).alias("__rate"),
    )
    b = hash_bucket(df, key_sql, n_buckets, seed).join(F.broadcast(rates), source_col)
    return b.filter(
        F.col("bucket") < (F.col("__rate") * n_buckets).cast("int")
    ).drop("bucket", "__rate")


def group_split(
    df: DataFrame,
    group_sql: str,
    train_pct: int = 80,
    seed: int = 13,
) -> DataFrame:
    """Leakage-safe GROUP-COHERENT split: the hash bucket is computed
    from a *group* key (source domain, site, author), so every row of a
    group lands on the same side — near-duplicate documents from one
    source can never straddle the train/test boundary, which is how
    eval contamination usually sneaks in (scikit-learn's
    GroupShuffleSplit contract, done with the engine's portable hash).

    Same zero-shuffle, partitioning-independent guarantees as
    :func:`hash_split`: one md5 per row inside codegen, assignment a
    pure function of the group key."""
    b = hash_bucket(df, group_sql, 100, seed)
    return b.withColumn(
        "split", F.when(F.col("bucket") < train_pct, "train").otherwise("test")
    )


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col,
    budget: int,
) -> DataFrame:
    """Per-group token-budget fill: walk each group's documents in a
    deterministic order and keep rows while the running token total
    stays within ``budget`` — how a training mix caps each source's
    contribution in TOKENS (the unit that matters) rather than
    documents. Emits every row with its running total and the keep
    verdict, so the cut is auditable. One shuffle (the per-group
    window); per-row state is a single running sum."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", tokens_col)
    return out.select(
        order_col,
        group_col,
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    ).withColumn("kept", F.col("cum_tokens") <= budget)
