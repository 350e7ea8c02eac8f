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


def epoch_shuffle(
    df: DataFrame,
    id_sql: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 23,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic training-epoch shuffle + shard assignment: the
    global sample order every data-loader epoch needs, reproducible
    from the data alone. Each (seed, epoch) pair induces a fixed
    pseudo-random permutation — order by portable_hash(id, seed:epoch)
    — so epoch 1 reshuffles relative to epoch 0, yet any worker can
    recompute its exact shard on restart without coordination.

    Emits ``shuffle_key`` (the 60-bit order key), ``epoch_pos`` (dense
    global position 0..N-1), round-robin ``shard`` = pos mod n_shards
    (shard sizes balanced within 1 row, no skew by construction), and
    ``within_shard_pos`` = pos div n_shards (each worker's local read
    order, derived arithmetically — no second shuffle).

    Scale shape: one md5 per row inside codegen, then the range
    partition + histogram prefix-sum of
    :func:`~mapr_plugins_spark.operators.indexing.global_row_index` —
    one range exchange over the data, everything else metadata-sized,
    no Python stage. The hash tie-breaks on the id, so the permutation
    is total even on the (astronomically unlikely) 60-bit collision."""
    from mapr_plugins_spark.operators.indexing import global_row_index

    d = with_seeded_hash60(df, "shuffle_key", id_sql, f"'{seed}e{epoch}'")
    d = global_row_index(d, "shuffle_key", "epoch_pos", tie_cols=(id_col,))
    return d.select(
        id_col,
        "shuffle_key",
        F.col("epoch_pos").cast("long").alias("epoch_pos"),
        F.pmod(F.col("epoch_pos"), F.lit(n_shards)).cast("long").alias("shard"),
        F.expr(f"epoch_pos DIV {n_shards}").cast("long").alias("within_shard_pos"),
    )


def dsir_select(
    df: DataFrame,
    target_pred_sql: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    k_per_group: int = 10,
    seed: int = 29,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public paper): score every raw document by how much more
    likely its hashed-bigram profile is under a TARGET domain's bucket
    distribution than under the raw corpus's, then keep the top-k per
    group. The standard way to skim "looks like the target domain"
    data out of a web crawl without a trained classifier.

    Per-doc feature = counts of token bigrams hashed into ``n_buckets``
    buckets (portable 60-bit md5, one per bigram, row-local HOFs — no
    explode of the corpus). Bucket log-likelihood ratios
    ``ln((tgt+1)/(tgt_tot+B)) - ln((raw+1)/(raw_tot+B))`` (add-one
    smoothing) are rounded to integer MICRO-units, so the per-doc
    importance weight ``Σ count[b]·ratio_micro[b]`` is exact integer
    arithmetic — order-free and engine-portable. (The only float step
    is the 64 bucket ``ln`` calls; a unit test pins every rounded
    value far from its .5 boundary, so JVM-vs-libm last-ulp drift
    cannot flip a micro-unit.)

    Scale shape: one pass builds the per-doc count vectors (persisted);
    the distribution aggregate reduces to ``n_buckets`` rows (a
    metadata-sized driver collect, like the IVF centroids), which embed
    back as a literal array — the weight pass is then zero-shuffle
    row-local ``zip_with``/``aggregate``. The final per-group top-k is
    one window partitioned by ``group_col`` (never a global sort)."""
    from pyspark.sql import Window

    from mapr_plugins_spark.operators.text import tokens_col

    B = n_buckets
    d = df.select(
        id_col,
        group_col,
        F.expr(target_pred_sql).alias("__is_tgt"),
        tokens_col(text_col).alias("__toks"),
    )
    bgs = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(0, size(__toks) - 2),"
            " i -> concat(element_at(__toks, i + 1), '_', element_at(__toks, i + 2)))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    d = d.withColumn("__bgs", bgs)

    def _bucket(g):
        # portable hash inside the HOF (Column-composed fast path —
        # one source of truth in functions/portable_hash.py)
        from mapr_plugins_spark.functions.portable_hash import seeded_hash60_col

        return F.pmod(seeded_hash60_col(g, str(seed)), F.lit(B))

    d = d.withColumn("__bks", F.transform("__bgs", _bucket))
    # count vector via B row-local passes over the bucket array —
    # O(B·n_bigrams) integer compares in codegen, the deliberate trade
    # against the alternative explode + corpus-wide shuffle shape (both
    # linear in corpus tokens; this one moves zero bytes). B is small
    # by design; for B ≫ 64 switch to the explode shape.
    cnts = F.expr(f"transform(sequence(0, {B - 1}), b -> size(filter(__bks, x -> x = b)))")
    d = (
        d.select(
            id_col,
            group_col,
            "__is_tgt",
            F.size("__bgs").alias("n_bigrams"),
            cnts.alias("__cnts"),
        )
        .persist()  # feeds the distribution aggregate AND the weight pass
    )
    ex = d.select("__is_tgt", F.posexplode("__cnts").alias("bucket", "c"))
    wall = Window.partitionBy()  # 64 rows — metadata-sized
    dist = (
        ex.groupBy("bucket")
        .agg(
            F.sum("c").alias("raw_n"),
            F.sum(F.when(F.col("__is_tgt"), F.col("c")).otherwise(F.lit(0))).alias("tgt_n"),
        )
        .withColumn("raw_tot", F.sum("raw_n").over(wall))
        .withColumn("tgt_tot", F.sum("tgt_n").over(wall))
    )
    # identical expression text to the DuckDB oracle's ratio CTE
    ratio = dist.select(
        "bucket",
        F.expr(
            f"CAST(round((ln((tgt_n + 1.0) / (tgt_tot + {B}.0))"
            f" - ln((raw_n + 1.0) / (raw_tot + {B}.0))) * 1000000, 0) AS BIGINT)"
        ).alias("r"),
    ).orderBy("bucket")
    rlist = [0] * B
    for row in ratio.collect():  # bounded: n_buckets rows of metadata
        rlist[row["bucket"]] = int(row["r"])
    lit_r = F.array(*[F.lit(v).cast("long") for v in rlist])
    out = d.withColumn(
        "weight_micro",
        F.aggregate(
            F.zip_with(F.col("__cnts"), lit_r, lambda c, r: c.cast("long") * r),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    w = Window.partitionBy(group_col).orderBy(F.col("weight_micro").desc(), id_col)
    return out.select(
        id_col,
        group_col,
        "n_bigrams",
        "weight_micro",
        F.row_number().over(w).cast("int").alias("sel_rank"),
    ).withColumn("kept", F.col("sel_rank") <= k_per_group)


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


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_sql: str,
    seed: str = "tmix1",
) -> DataFrame:
    """α=0.5 temperature-based domain rebalancing — the multilingual /
    multi-domain sampling rule of XLM-R and mT5 (public papers): the
    output share of source s is proportional to n_s^α, flattening the
    domain distribution without discarding the long tail entirely
    (α=1 keeps the natural mix; `rebalance_sources` is the α→0
    equal-share endpoint; α=1/2 is the standard middle).

    Downsample-only formulation: the acceptance rate for source s is
    r_s = sqrt(n_min / n_s), so the smallest source is kept whole and
    kept_s ≈ sqrt(n_s · n_min) ∝ n_s^(1/2) — the temperature law.
    α is FIXED at 1/2 deliberately: sqrt and division are correctly
    rounded under IEEE 754 in both Spark and DuckDB, so the per-source
    rate (micro-units) is bit-identical cross-engine, which a general
    pow(x, α) cannot promise (libm pow is not correctly rounded).

    Plan shape at 100 TB: one map-side-combined count aggregate
    (source-cardinality rows), broadcast back onto the scan, per-row
    portable-hash acceptance in codegen — the corpus itself never
    shuffles. Output: kept rows + their source's n_source/rate_micro
    audit columns."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    nmin = counts.agg(F.min("n_source").alias("__nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        source_col,
        "n_source",
        F.expr(
            "CAST(floor(1000000 * sqrt(CAST(__nmin AS DOUBLE) "
            "/ CAST(n_source AS DOUBLE))) AS BIGINT)"
        ).alias("rate_micro"),
    )
    tagged = with_seeded_hash60(df, "__h", id_sql, f"'{seed}'")
    return (
        tagged.join(F.broadcast(rates), source_col)
        .filter(F.col("__h") % 1_000_000 < F.col("rate_micro"))
        .drop("__h")
    )


#: Poisson(1) CDF thresholds scaled to 2^60 (floor(CDF(k)·2^60),
#: k = 0..7): a portable-hash value h ∈ [0, 2^60) maps to the bootstrap
#: weight w = |{k : h ≥ T_k}| — the inverse-CDF draw in PURE INTEGER
#: arithmetic, identical in Spark SQL and DuckDB (P(w > 7) ≈ 1e-5 is
#: truncated; the truncation is part of the deterministic spec).
POISSON1_THRESHOLDS_2_60: tuple[int, ...] = (
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776,
)


def poisson_weight_sql(hash_col: str) -> str:
    """SQL fragment (valid in Spark SQL AND DuckDB) mapping a 60-bit
    hash column to its deterministic Poisson(1) bootstrap weight."""
    return "(" + " + ".join(
        f"(CASE WHEN {hash_col} >= {t} THEN 1 ELSE 0 END)"
        for t in POISSON1_THRESHOLDS_2_60
    ) + ")"


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    key_sql: str,
    value_col: str,
    n_replicates: int = 32,
    seed: int = 29,
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean
    (the online-bootstrap classic — Oza & Russell 2001; Chamandy et al.
    2012 "Estimating Uncertainty for Massive Data Streams" describes
    exactly this Poisson formulation at planet scale): each row enters
    replicate ``r`` with weight ~ Poisson(1), drawn via the portable
    hash of ``(key, r)`` against integer CDF thresholds — NO RNG state,
    so the whole estimate is replayable cross-engine bit-for-bit.

    Output (one row): ``n_rows``, ``n_replicates``, ``point_mean`` and
    the percentile interval [``ci_lo``, ``ci_hi``] = the ``lo_rank``-th
    / ``hi_rank``-th order statistics of the replicate means (defaults:
    2nd/31st of 32 ⇒ a central ~93.75% interval).

    100 TB posture: the replicate explosion is a flat ×R map (no
    shuffle), replicate sums are map-side combined into R·2 cells, and
    the final order statistics sort R values — state is O(R), never
    O(rows). Sums are exact DECIMAL/BIGINT; each mean is ONE double
    division, so order statistics agree across engines exactly.

    Deliberately NOT fan_out'd (round-14, measured then reverted):
    inserting a round-robin exchange before the ×R explode
    parallelizes the md5 draws (5.1 → 1.3 s at sf0.1, where the input
    is one split) but when ``value_col`` is a DOUBLE the replicate
    sum ``SUM(__w·__v)`` is summation-order-dependent, and the
    repartition changes every replicate mean by ulps — the oracle
    differential gate catches exactly this (x_bootstrap_ci MISMATCH at both
    sf0.01 and sf0.1 with the exchange in place). The replicate mean's
    cross-engine determinism rides the input's stable scan order, so
    the partitioning must stay whatever the scan yields."""
    reps = df.select(
        F.col(value_col).alias("__v"),
        F.expr(f"CAST({key_sql} AS STRING)").alias("__k"),
    ).select(
        "__v", "__k",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__r"),
    )
    hashed = with_seeded_hash60(
        reps, "__h", "concat(__k, ':', CAST(__r AS STRING))", f"'{seed}'"
    )
    w = hashed.withColumn("__w", F.expr(poisson_weight_sql("__h")))
    means = w.groupBy("__r").agg(
        F.expr("CAST(SUM(__w * __v) AS DOUBLE) / CAST(SUM(__w) AS DOUBLE)")
        .alias("__mean")
    )
    stats = means.agg(
        F.sort_array(F.collect_list("__mean")).alias("__ms")
    )
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(f"CAST(SUM({value_col}) AS DOUBLE) / COUNT({value_col})")
        .alias("point_mean"),
    )
    return base.crossJoin(F.broadcast(stats)).select(
        "n_rows",
        F.lit(n_replicates).alias("n_replicates"),
        "point_mean",
        F.element_at("__ms", lo_rank).alias("ci_lo"),
        F.element_at("__ms", hi_rank).alias("ci_hi"),
    )
