"""Edge-case pins for gap_fill / funnel / cohort_retention /
stratified sampling (happy paths are oracle-checked by driver_sim)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapr_plugins_spark.operators.analytics import cohort_retention, funnel, gap_fill


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def test_gap_fill_locf_and_gap_flags(spark):
    rows = [
        (1, _ts("2024-01-01T00:10:00"), 5.0),
        (1, _ts("2024-01-01T03:20:00"), 7.0),  # hours 1 and 2 are gaps
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP_NTZ, v DOUBLE")
    out = gap_fill(df, "k", "ts", "v").orderBy("bucket").collect()
    assert [(r["v_filled"], r["is_gap"]) for r in out] == [
        (5.0, False), (5.0, True), (5.0, True), (7.0, False),
    ]


def test_funnel_requires_order(spark):
    rows = [
        # user 1: click BEFORE first view → step2 not reached
        (1, _ts("2024-01-01T00:00:00"), "click"),
        (1, _ts("2024-01-01T01:00:00"), "view"),
        # user 2: view then click then purchase → all steps
        (2, _ts("2024-01-01T00:00:00"), "view"),
        (2, _ts("2024-01-01T00:01:00"), "click"),
        (2, _ts("2024-01-01T00:02:00"), "purchase"),
        # user 3: purchase first, view later, no click → step1 only
        (3, _ts("2024-01-01T00:00:00"), "purchase"),
        (3, _ts("2024-01-01T01:00:00"), "view"),
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP_NTZ, t STRING")
    out = funnel(
        df, "k", "ts",
        [F.col("t") == "view", F.col("t") == "click", F.col("t") == "purchase"],
    )
    assert {(r["step"], r["n_keys"]) for r in out.collect()} == {(1, 3), (2, 1), (3, 1)}


def test_funnel_same_timestamp_counts(spark):
    # step boundary is inclusive (>=): view and click at the same instant
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "view"), (1, _ts("2024-01-01T00:00:00"), "click")],
        "k INT, ts TIMESTAMP_NTZ, t STRING",
    )
    out = funnel(df, "k", "ts", [F.col("t") == "view", F.col("t") == "click"])
    assert {(r["step"], r["n_keys"]) for r in out.collect()} == {(1, 1), (2, 1)}


def test_cohort_retention_offsets(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00")),  # Monday, cohort week 2024-01-01
        (1, _ts("2024-01-10T10:00:00")),  # next week → offset 1
        (1, _ts("2024-01-21T10:00:00")),  # Sunday of week starting 01-15 → offset 2
        (2, _ts("2024-01-10T10:00:00")),  # cohort week 2024-01-08
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP_NTZ")
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_keys"]
        for r in cohort_retention(df, "k", "ts").collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_stratified_sample_rates(spark, sf_dir):
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.sampling import stratified_hash_sample

    cust = table(spark, sf_dir, "customer")
    out = stratified_hash_sample(
        cust, "CAST(c_custkey AS STRING)", "c_mktsegment",
        {"BUILDING": 1.0, "MACHINERY": 0.0}, default_rate=0.25,
    )
    by_seg = {r["c_mktsegment"]: r["n"] for r in
              out.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    tot = {r["c_mktsegment"]: r["n"] for r in
           cust.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    assert by_seg["BUILDING"] == tot["BUILDING"]  # rate 1.0 keeps all
    assert "MACHINERY" not in by_seg             # rate 0.0 drops all
    for seg in by_seg:
        if seg != "BUILDING":
            assert 0.1 < by_seg[seg] / tot[seg] < 0.45  # ~25%


def _brute_merge(intervals):
    """Reference merge of [start, end) intervals: touching endpoints
    coalesce (the operator's > test on the running max-end)."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


def test_merge_intervals_hand_cases(spark):
    from mapr_plugins_spark.operators.analytics import merge_intervals

    cases = [
        # touching endpoints coalesce: [0,10)+[10,20) -> [0,20)
        ("touch", [(0, 10), (10, 20)], {(0, 20, 2)}),
        # nested interval absorbed
        ("nested", [(0, 100), (10, 20)], {(0, 100, 2)}),
        # exact duplicates both count
        ("dup", [(5, 9), (5, 9)], {(5, 9, 2)}),
        # disjoint stay apart
        ("gap", [(0, 5), (6, 9)], {(0, 5, 1), (6, 9, 1)}),
        # chain through a bridge
        ("chain", [(0, 5), (4, 8), (8, 12), (20, 25)], {(0, 12, 3), (20, 25, 1)}),
    ]
    rows = [(k, s, e) for k, ivs, _ in cases for s, e in ivs]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = merge_intervals(df, "k", "s", "e").collect()
    for key, _, want in cases:
        have = {(r.m_start, r.m_end, r.n_merged) for r in got if r.k == key}
        assert have == want, f"{key}: {have} != {want}"


def test_merge_intervals_randomized_vs_brute(spark):
    import random

    from mapr_plugins_spark.operators.analytics import merge_intervals

    rng = random.Random(20260813)
    rows, want = [], {}
    for key in range(12):
        ivs = []
        for _ in range(rng.randint(1, 40)):
            s = rng.randint(0, 300)
            e = s + rng.randint(1, 50)
            ivs.append((s, e))
        rows += [(f"k{key}", s, e) for s, e in ivs]
        want[f"k{key}"] = _brute_merge(ivs)
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = merge_intervals(df, "k", "s", "e").collect()
    for key, expected in want.items():
        have = {(r.m_start, r.m_end, r.n_merged) for r in got if r.k == key}
        assert have == expected, f"{key}: {have} != {expected}"


def test_incremental_agg_state_survives_beyond_decimal18_headroom(spark):
    """The mergeable state's sum must carry decimal(38,6): merging
    waves whose combined sum exceeds decimal(18,6)'s 12 integer
    digits (the round-5 ADVICE overflow) must stay exact, as the
    DuckDB oracle's widened SUM does."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.analytics import (
        incremental_agg_merge,
        incremental_agg_state,
    )

    # 40 rows of 999,999,999,999.5 -> total ~4e13, past 18,6 capacity
    df = spark.range(0, 40).select(
        F.lit("k").alias("g"),
        F.col("id").alias("w"),
        F.lit(999_999_999_999.5).alias("value"),
    )
    waves = [
        incremental_agg_state(df.filter(F.col("w") % 2 == i), ["g"], "value")
        for i in (0, 1)
    ]
    merged = incremental_agg_merge(waves, ["g"]).collect()
    assert len(merged) == 1
    row = merged[0]
    assert row.cnt == 40
    assert str(merged[0].sum_dec) == "39999999999980.000000", row.sum_dec
    assert dict(merged[0].asDict())["sum_dec"] is not None
