"""MERGE / upsert semantics over plain DataFrames.

The reference's keyed document sink (A6, MapRDBJSONSink.java:67-110)
writes into a mutable keyed table, where re-sending a key overwrites the
document — i.e. the store's semantics are upsert. Spark's immutable
parquet world expresses that as a MERGE between the current table state
and a changeset:

    WHEN MATCHED AND <delete_condition>   THEN DELETE
    WHEN MATCHED                          THEN UPDATE SET <update_cols>
    WHEN NOT MATCHED (by target)          THEN INSERT
    WHEN NOT MATCHED BY SOURCE            THEN keep the target row

Implemented as ONE full-outer shuffle join on the key columns plus a
codegen'd projection — no driver state, no per-row Python. At 100 TB
this is the standard CDC-apply shape; if the changeset is small Catalyst
broadcast the source side instead (full-outer needs the shuffle, so we
leave the strategy to the planner/AQE).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    delete_condition: Column | None = None,
) -> DataFrame:
    """Apply SQL-MERGE semantics and return the new table state.

    ``source`` must be unique per key (a changeset, not a log — compact
    first if needed). ``update_cols`` are taken from the source on
    match; all other target columns are preserved. Source-only rows are
    inserted (columns absent from the source come back null).
    ``delete_condition`` is evaluated against source columns (use
    ``F.col("s.<name>")``).
    """
    t = target.withColumn("__t", F.lit(1)).alias("t")
    s = source.withColumn("__s", F.lit(1)).alias("s")
    j = t.join(s, on=list(keys), how="full_outer")
    matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()

    out: list[Column] = [F.col(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        tc = F.col(f"t.{c}")
        if c in update_cols:
            # source value on match (update) AND on source-only (insert)
            out.append(
                F.when(F.col("__s").isNotNull(), F.col(f"s.{c}")).otherwise(tc).alias(c)
            )
        elif c in source.columns:
            # unchanged on match, source value on insert
            out.append(F.coalesce(tc, F.col(f"s.{c}")).alias(c))
        else:
            out.append(tc.alias(c))

    if delete_condition is not None:
        j = j.filter(~(matched & F.coalesce(delete_condition, F.lit(False))))
    return j.select(*out)


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: collapse the
    per-key event stream to the rows where the tracked attribute
    actually changed, and emit validity intervals —

        (key, attr, valid_from_us, valid_to_us, is_current, version)

    ``valid_to_us`` is NULL on the open (current) interval. The classic
    warehouse dimension-history build, and the LLM-corpus analogue is
    snapshot lineage: which curation label applied to a document during
    which ingestion window.

    Plan: both window passes share one ``partitionBy(key)`` ordering, so
    the whole operator is a SINGLE shuffle — the change-detection filter
    preserves the exchange's partitioning and the second window reuses
    it. State per key is O(1) (lag/lead/row_number stream through
    sorted runs); no skew risk beyond the key distribution itself, which
    AQE handles.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    nxt = F.lead(ts_col).over(w)
    # ts is TIMESTAMP_NTZ by catalog contract; the NTZ→LTZ cast reads
    # the wall time in the session zone, which the catalog pins to UTC,
    # so these micros equal DuckDB's epoch_us over the naive timestamp
    # under ANY host session timezone.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        us(F.col(ts_col)).alias("valid_from_us"),
        us(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_us_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Point-in-time (temporal) lookup against a type-2 dimension: each
    fact row attaches the dimension version whose validity interval
    contains its timestamp — the correctness-critical join every
    warehouse backfill and every leakage-safe feature pipeline needs
    (joining TODAY's dimension row onto YESTERDAY's fact leaks the
    future).

    Because SCD2 intervals partition each key's timeline, "the version
    valid at t" ≡ "the last version starting at or before t", so the
    lookup rides the as-of join machinery (union + running window —
    ONE shuffle, no interval pair blow-up). Zero-length intervals
    (two changes in the same microsecond) are dropped first: interval
    containment cannot match them, and they would make the as-of
    reduction ambiguous. ``dim`` needs columns
    (key, valid_from_us, valid_to_us, *value_cols)."""
    from mapr_plugins_spark.operators.joins import asof_join

    live = dim.filter(
        F.col("valid_to_us").isNull()
        | (F.col("valid_to_us") != F.col("valid_from_us"))
    ).select(key_col, F.col("valid_from_us").alias("__t_us"), *value_cols)
    f = facts.withColumn("__t_us", F.col(fact_us_col))
    out = asof_join(f, live, on="__t_us", by=key_col, value_cols=value_cols)
    renames = [F.col(f"{c}_asof").alias(c) for c in value_cols]
    return out.select(*facts.columns, *renames)


def scd2_apply(
    dim: DataFrame,
    delta: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """INCREMENTALLY apply a new wave of change events to an existing
    type-2 dimension — the CDC maintenance path: provably equal to
    rebuilding with :func:`scd2_build` over the combined log, but
    touching only O(|delta| + current rows of affected keys) instead
    of the full history (at 100 TB the history is the table; the wave
    is a sliver).

    Mechanics: the current (open) row of each affected key re-enters
    the change-detection window as a synthetic base event carrying its
    version as the numbering offset; unaffected keys and closed
    historical rows pass through untouched (no shuffle — the window
    shuffle covers only base+delta events of affected keys).

    Precondition (the standard CDC watermark contract): every delta
    event is STRICTLY LATER than its key's current ``valid_from_us``.
    Violations fail loudly in-plan (``raise_error`` folded into the
    event timestamp every window consumer reads) — a silent reorder
    would corrupt history.

    Output schema ≡ :func:`scd2_build`:
    ``(key, attr, valid_from_us, valid_to_us, is_current, version)``.
    """
    from pyspark.sql import Window

    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    akeys = delta.select(key_col).distinct()
    cur = dim.filter(F.col("is_current"))
    cur_aff = cur.join(akeys, key_col, "left_semi")

    base = cur_aff.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from_us").alias("__us"),
        F.lit(None).cast(delta.schema[tiebreak_col].dataType).alias("__tb"),
        F.lit(1).alias("__is_base"),
        (F.col("version") - 1).alias("__offset"),
    )
    dev = delta.select(
        F.col(key_col),
        F.col(attr_col),
        us(F.col(ts_col)).alias("__us"),
        F.col(tiebreak_col).alias("__tb"),
        F.lit(0).alias("__is_base"),
        F.lit(None).cast("long").alias("__offset"),
    )
    ev = base.unionByName(dev)

    wk = Window.partitionBy(key_col)
    w = Window.partitionBy(key_col).orderBy(
        F.col("__us").asc(), F.col("__is_base").desc(), F.col("__tb").asc_nulls_first()
    )
    base_us = F.max(F.when(F.col("__is_base") == 1, F.col("__us"))).over(wk)
    # watermark guard: folded into the timestamp every downstream
    # window expression reads, so it evaluates for EVERY delta event
    guarded_us = F.when(
        (F.col("__is_base") == 0) & base_us.isNotNull() & (F.col("__us") <= base_us),
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: delta event at or before the current "
                      "version's valid_from for key "),
                F.col(key_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("__us"))
    ev = ev.select(
        key_col,
        attr_col,
        guarded_us.alias("__us"),
        "__tb",
        "__is_base",
        F.coalesce(F.max("__offset").over(wk), F.lit(0)).alias("__off"),
    )

    changed = (
        ev.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    nxt = F.lead("__us").over(w)
    rebuilt = changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("__us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        (F.col("__off") + F.row_number().over(w)).cast("long").alias("version"),
    )

    untouched = dim.join(akeys, key_col, "left_anti")
    hist_aff = dim.filter(~F.col("is_current")).join(akeys, key_col, "left_semi")
    out_cols = [key_col, attr_col, "valid_from_us", "valid_to_us", "is_current", "version"]
    return (
        untouched.select(*out_cols)
        .unionByName(hist_aff.select(*out_cols))
        .unionByName(rebuilt.select(*out_cols))
    )
