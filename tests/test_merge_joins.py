"""Edge-case pins for merge_upsert, overlap_join_binned, and the
vocabulary encoder (the happy paths are oracle-checked by driver_sim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapr_plugins_spark.operators.joins import overlap_join_binned
from mapr_plugins_spark.operators.merge import merge_upsert
from mapr_plugins_spark.operators.text import build_vocab, encode_tokens


def _merge_fixture(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k BIGINT, name STRING, bal DOUBLE",
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0, "U"), (3, "c2", 0.0, "D"), (9, "new", 1.0, "I")],
        "k BIGINT, name STRING, bal DOUBLE, op STRING",
    )
    return target, source


def test_merge_update_delete_insert_keep(spark):
    target, source = _merge_fixture(spark)
    out = merge_upsert(
        target, source, keys=["k"], update_cols=["bal"],
        delete_condition=F.col("s.op") == "D",
    )
    rows = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),     # untouched (not matched by source)
        2: ("b", 99.0),     # bal updated, name preserved (not an update col)
        9: ("new", 1.0),    # inserted: non-update col taken from source
    }                       # 3 deleted


def test_merge_without_delete_condition_keeps_matches(spark):
    target, source = _merge_fixture(spark)
    out = merge_upsert(target, source, keys=["k"], update_cols=["bal", "name"])
    rows = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert rows[3] == ("c2", 0.0)  # no delete clause → updated instead
    assert len(rows) == 4


def test_merge_source_missing_column_is_null_on_insert(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], "k BIGINT, name STRING, bal DOUBLE")
    source = spark.createDataFrame([(5, 7.0)], "k BIGINT, bal DOUBLE")
    out = merge_upsert(target, source, keys=["k"], update_cols=["bal"])
    ins = out.filter(F.col("k") == 5).collect()[0]
    assert ins["bal"] == 7.0 and ins["name"] is None


def test_overlap_join_pair_spanning_many_bins_appears_once(spark):
    # left interval [0, 1000) spans 3 bins at width 400; right [350, 450)
    # overlaps it in two of them — canonical-bin filter must dedup.
    left = spark.createDataFrame([(1, 0.0, 1000.0)], "lid INT, lo DOUBLE, hi DOUBLE")
    right = spark.createDataFrame([(2, 350.0, 450.0)], "rid INT, rlo DOUBLE, rhi DOUBLE")
    out = overlap_join_binned(left, right, "lo", "hi", "rlo", "rhi", 400)
    assert out.count() == 1


def test_overlap_join_matches_naive_predicate(spark):
    import random

    rnd = random.Random(42)

    def intervals(n, max_width):
        out = []
        for i in range(n):
            lo = rnd.uniform(-900, 900)
            out.append((i, lo, lo + rnd.uniform(1, max_width)))
        return out

    li, ri = intervals(80, 700), intervals(60, 500)
    left = spark.createDataFrame(li, "lid INT, lo DOUBLE, hi DOUBLE")
    right = spark.createDataFrame(ri, "rid INT, rlo DOUBLE, rhi DOUBLE")
    naive = left.join(
        right, (F.col("lo") < F.col("rhi")) & (F.col("rlo") < F.col("hi"))
    ).select("lid", "rid")
    binned = overlap_join_binned(left, right, "lo", "hi", "rlo", "rhi", 300).select(
        "lid", "rid"
    )
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in binned.collect()}


def test_vocab_encode_oov_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "zz aa")], "doc_id BIGINT, text STRING"
    )
    vocab = build_vocab(docs, size=2)  # aa(id 0, cnt 3), bb/cc/zz tie on cnt 1 → bb id 1
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert v == {"aa": 0, "bb": 1}
    enc = {r["doc_id"]: r["ids"] for r in encode_tokens(docs, vocab).collect()}
    assert enc == {1: [0, 1, 0, -1], 2: [-1, 0]}


def test_asof_join_forward_and_tolerance_semantics(spark):
    """merge_asof parity on a constructed frame: forward picks the
    nearest at-or-after row; tolerance nulls (never drops) matches
    farther than the window."""
    import datetime as dt

    from mapr_plugins_spark.operators.joins import asof_join

    def t(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, t(10), "L1"), (1, t(20), "L2"), (2, t(5), "L3")],
        "k INT, ts TIMESTAMP_NTZ, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(15), 150.0), (1, t(40), 400.0), (2, t(9), 900.0)],
        "k INT, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    fwd = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, on="ts", by="k", value_cols=["v"], direction="forward"
        ).collect()
    }
    # L1: at-or-after 10 → 10 (inclusive); L2: next is 40; L3: 9 < 5? no — next after 5 is 9
    assert fwd == {"L1": 100.0, "L2": 400.0, "L3": 900.0}, fwd

    tol = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, on="ts", by="k", value_cols=["v"],
            tolerance_us=5_000_000,
        ).collect()
    }
    # L1: match at 10, gap 0 ≤ 5s → kept; L2: match at 15, gap 5s → kept;
    # L3: no earlier purchase → null. Tighten: with 4s tolerance L2 nulls.
    assert tol == {"L1": 100.0, "L2": 150.0, "L3": None}, tol
    tight = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, on="ts", by="k", value_cols=["v"],
            tolerance_us=4_000_000,
        ).collect()
    }
    assert tight == {"L1": 100.0, "L2": None, "L3": None}, tight


def _scd2_fixture(spark):
    """Tiny change log with a clean T=2500 cutoff: key 1 changes
    across the boundary, key 2 stays unchanged in the wave, key 3 is
    NEW in the wave."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a", 1000, 1), (1, "b", 2000, 2),   # history
        (1, "c", 3000, 3), (1, "c", 4000, 4),   # wave: change + no-op
        (2, "x", 1500, 5),                       # history only
        (2, "x", 3500, 6),                       # wave no-op
        (3, "n", 3200, 7), (3, "m", 3900, 8),   # brand-new key
    ]
    ev = spark.createDataFrame(
        rows, "k BIGINT, attr STRING, us BIGINT, eid BIGINT"
    ).select(
        "k", "attr",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
        "eid",
    )
    return ev


def test_scd2_apply_equals_rebuild_on_constructed_log(spark):
    """apply(build(log<=T), log>T) must equal build(log) row-for-row —
    including a no-op wave key, a cross-boundary change, and a key
    born in the wave."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.merge import scd2_apply, scd2_build

    ev = _scd2_fixture(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dim = scd2_build(ev.filter(us <= 2500), "k", "attr", "ts", "eid")
    out = scd2_apply(dim, ev.filter(us > 2500), "k", "attr", "ts", "eid")
    full = scd2_build(ev, "k", "attr", "ts", "eid")
    key = ["k", "valid_from_us"]
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))
    # the no-op wave key keeps ONE open row, version 1
    k2 = [r for r in out.collect() if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].version == 1
    # the new key versions from 1
    k3 = sorted((r for r in out.collect() if r.k == 3), key=lambda r: r.version)
    assert [r.version for r in k3] == [1, 2] and k3[-1].is_current


def test_scd2_apply_watermark_guard_throws(spark):
    """A delta event at or before its key's current valid_from must
    fail the query loudly (the CDC watermark contract), never reorder
    history silently."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.merge import scd2_apply, scd2_build

    ev = _scd2_fixture(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dim = scd2_build(ev.filter(us <= 2500), "k", "attr", "ts", "eid")
    late = ev.filter(us <= 1200)  # at/before key 1's current valid_from
    with _pytest.raises(Exception, match="scd2_apply"):
        scd2_apply(dim, late, "k", "attr", "ts", "eid").collect()


def _noop_shadow_fixture(spark):
    """Key 1's history: change at 1000, then a NO-OP event at 2000
    (same attr — scd2_build's change detection drops it). A delta at
    1500 is after the current valid_from (1000) but BEFORE the dropped
    no-op — the round-5 ADVICE divergence case: a full rebuild
    interleaves the delta before the no-op, which then re-becomes a
    change and emits an extra version."""
    from pyspark.sql import functions as F

    rows = [(1, "a", 1000, 1), (1, "a", 2000, 2)]
    return spark.createDataFrame(
        rows, "k BIGINT, attr STRING, us BIGINT, eid BIGINT"
    ).select(
        "k", "attr",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
        "eid",
    )


def test_scd2_apply_last_event_guard_catches_noop_shadow(spark):
    """With carry_last_event=True the guard enforces the EXACT
    precondition (delta strictly later than the key's last raw event,
    no-ops included): the shadowed delta fails loudly instead of
    silently diverging from the full rebuild."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.merge import scd2_apply, scd2_build

    ev = _noop_shadow_fixture(spark)
    delta = spark.createDataFrame(
        [(1, "b", 1500, 9)], "k BIGINT, attr STRING, us BIGINT, eid BIGINT"
    ).select(
        "k", "attr",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
        "eid",
    )
    dim = scd2_build(ev, "k", "attr", "ts", "eid", carry_last_event=True)
    assert [r.last_event_us for r in dim.collect()] == [2000]
    with _pytest.raises(Exception, match="scd2_apply.*last event"):
        scd2_apply(dim, delta, "k", "attr", "ts", "eid").collect()
    # The valid_from-only guard CANNOT see the dropped no-op: the same
    # wave passes silently — the documented weaker contract the
    # last_event_us watermark exists to close.
    weak_dim = scd2_build(ev, "k", "attr", "ts", "eid")
    weak = scd2_apply(weak_dim, delta, "k", "attr", "ts", "eid").collect()
    assert len(weak) == 2  # diverges: rebuild over the full log has 3 versions


def test_scd2_apply_refreshes_last_event_on_current_rows(spark):
    """A carried dimension chains: after a wave, each affected key's
    CURRENT row holds the wave's max event timestamp, so the next
    wave's guard reads the fresh watermark; a legal second wave then
    still satisfies the equivalence law."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.merge import scd2_apply, scd2_build

    ev = _scd2_fixture(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dim = scd2_build(
        ev.filter(us <= 2500), "k", "attr", "ts", "eid", carry_last_event=True
    )
    wave1 = ev.filter((us > 2500) & (us <= 3600))
    wave2 = ev.filter(us > 3600)
    mid = scd2_apply(dim, wave1, "k", "attr", "ts", "eid")
    cur_le = {r.k: r.last_event_us for r in mid.filter("is_current").collect()}
    assert cur_le[1] == 3000 and cur_le[2] == 3500 and cur_le[3] == 3200
    out = scd2_apply(mid, wave2, "k", "attr", "ts", "eid").drop("last_event_us")
    full = scd2_build(ev, "k", "attr", "ts", "eid")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, full.collect())
    )
