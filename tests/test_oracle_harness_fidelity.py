"""Pins the local oracle harness to the driver's pandas-based
canonicalization semantics.

Round 2 shipped two driver hash-fails (q62_sessionize,
x_interval_merge) that local green did not predict: DuckDB window-SUM
returns HUGEINT, which pandas materializes as float64 while the old
``fetchall()`` path hid it as a Python int. These tests make that
fidelity gap impossible to reintroduce.
"""

from __future__ import annotations

import duckdb

from tests.oracle_harness import _canon_value, canonicalize, run_duckdb


def test_int_and_float_never_canonically_equal():
    # The driver's value-hash distinguishes int64 9 from float64 9.0.
    assert _canon_value(9) != _canon_value(9.0)
    assert canonicalize([{"a": 9}]) != canonicalize([{"a": 9.0}])
    # but equal values of the same dtype family still match
    assert _canon_value(9.0) == _canon_value(9.0000000000001)  # rounded
    assert _canon_value(True) == _canon_value(True)
    assert _canon_value(True) != _canon_value(1)  # bool is not int64


def test_run_duckdb_materializes_like_the_driver(tmp_path):
    # A window SUM over integers is HUGEINT in DuckDB; pandas (the
    # driver's path) turns it into float64. The harness must see the
    # float, not a fetchall() int.
    con = duckdb.connect()
    raw = con.execute("SELECT sum(1) OVER () AS s").fetchdf()
    con.close()
    assert str(raw.dtypes["s"]) == "float64", (
        "environment drift: DuckDB window SUM no longer HUGEINT→float64; "
        "re-verify the driver artifact class"
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        pq.write_table(pa.table({"x": [1, 2, 3]}), tmp_path / f"{t}.parquet")
    rows = run_duckdb(
        "SELECT x, sum(x) OVER (ORDER BY x) AS ws FROM region", str(tmp_path)
    )
    assert all(isinstance(r["ws"], float) for r in rows), rows
    assert all(isinstance(r["x"], int) for r in rows), rows


def test_null_and_nan_collapse_to_none():
    # pandas float columns cannot tell NULL from NaN; neither can the
    # driver. The canon collapses both so local matches driver.
    assert _canon_value(float("nan")) is None
