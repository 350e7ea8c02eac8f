"""Property-based spot checks (SURVEY §5.2 item 4, via hypothesis).

Laws: JSON encode/decode round-trip over the §1.2 type lattice, dedup
idempotence, and union/except multiset algebra. Examples are small
(≤12 rows) — the laws are structural, not scale-dependent.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_scalar_row = st.tuples(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.booleans() | st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=32) | st.none(),
    st.text(max_size=12) | st.none(),
    st.lists(st.integers(min_value=-100, max_value=100), max_size=4) | st.none(),
)
_rows = st.lists(_scalar_row, min_size=1, max_size=12)

_SCHEMA = "i INT, b BOOLEAN, f FLOAT, s STRING, arr ARRAY<INT>"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _bag(df):
    from collections import Counter

    def canon(v):
        if isinstance(v, list):
            return tuple(v)
        return v

    return Counter(tuple(canon(x) for x in r) for r in df.collect())


@given(rows=_rows)
@settings(**_SETTINGS)
def test_json_round_trip_law(spark, rows):
    """from_json(to_json(x)) == x for every non-null field of the type
    lattice (null fields come back null — the doc-sink skip-null rule is
    tested separately in test_document_sink.py)."""
    df = _df(spark, rows)
    back = df.select(
        F.from_json(F.to_json(F.struct(*df.columns)), _SCHEMA).alias("r")
    ).select("r.*")
    assert _bag(back) == _bag(df)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_dedup_idempotence(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    b1, b2 = _bag(once), _bag(twice)
    assert b1 == b2
    assert set(b1) == set(_bag(df))  # same distinct rows
    assert all(c == 1 for c in b1.values())


@given(rows_a=_rows, rows_b=_rows)
@settings(**_SETTINGS)
def test_union_except_multiset_identity(spark, rows_a, rows_b):
    """(A ⊎ B) exceptAll B == A (bag semantics)."""
    a, b = _df(spark, rows_a), _df(spark, rows_b)
    back = a.unionByName(b).exceptAll(b)
    assert _bag(back) == _bag(a)


@given(rows_a=_rows, rows_b=_rows)
@settings(**_SETTINGS)
def test_intersect_except_partition_distinct(spark, rows_a, rows_b):
    """A's distinct rows partition into (A ∩ B) and (A − B)."""
    a, b = _df(spark, rows_a), _df(spark, rows_b)
    inter = _bag(a.intersect(b))
    minus = _bag(a.subtract(b))
    assert set(inter) | set(minus) == set(_bag(a))
    assert not (set(inter) & set(minus))
