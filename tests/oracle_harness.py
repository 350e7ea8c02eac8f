"""Local mirror of the driver's oracle-differential check.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
directory, canonicalizes both results (columns sorted by name, rows
sorted, floats rounded), and asserts equality. Stricter than green CI:
a failure here means the t2 gate would fail.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from mapr_plugins_spark.catalog import TABLES

ROUND_DP = 9


def _from_pandas(v: Any) -> Any:
    """Unwrap numpy/pandas scalars to Python natives, preserving the
    int-vs-float distinction the driver's hash is sensitive to."""
    import numpy as np

    if isinstance(v, np.generic):  # scalar, not ndarray
        return v.item()
    return v


def run_duckdb(sql: str, sf_dir: str) -> list[dict[str, Any]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        # Materialize through pandas, exactly like the driver's
        # canonicalizer: DuckDB HUGEINT (e.g. window SUM over ints)
        # becomes float64 here, while fetchall() would hide it as a
        # Python int. Round-2 shipped two driver hash-fails because the
        # old fetchall() path made local green fail to predict driver
        # red — never weaken this back.
        pdf = con.execute(sql).fetchdf()
        cols = list(pdf.columns)
        return [
            {c: _from_pandas(v) for c, v in zip(cols, row)}
            for row in pdf.itertuples(index=False, name=None)
        ]
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            # pandas materialization (both sides, in the driver) cannot
            # tell NULL from NaN in a float column — collapse both.
            return None
        # Type-tagged: the driver's value-hash distinguishes int64 9
        # from float64 9.0 (dtype artifact class, rounds 1 and 2), so
        # the local canon must never let 9.0 == 9 pass.
        return ("f", round(v, ROUND_DP))
    if v is not None and str(v) == "NaT":  # pandas NULL timestamp
        return None
    if isinstance(v, int):
        return ("i", v)
    if type(v).__module__.startswith("numpy") and hasattr(v, "tolist"):
        return _canon_value(v.tolist())  # ndarray from toPandas array cols
    if hasattr(v, "asDict"):  # pyspark Row (struct cell)
        return _canon_value(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    return v


def canonicalize(rows: list[dict[str, Any]]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_canon_value(r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def spark_rows(df) -> list[dict[str, Any]]:
    # Materialize through pandas like the driver does (toPandas), not
    # collect(): a BIGINT column containing NULLs becomes float64 on
    # BOTH sides this way (collect would keep Python ints on the Spark
    # side and flag a mismatch the driver never sees).
    pdf = df.toPandas()
    cols = list(pdf.columns)
    return [
        {c: _from_pandas(v) for c, v in zip(cols, row)}
        for row in pdf.itertuples(index=False, name=None)
    ]


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, key: str = "?") -> None:
    got = canonicalize(spark_rows(spark_df))
    want = canonicalize(run_duckdb(oracle_sql, sf_dir))
    assert len(got) == len(want), (
        f"[{key}] row count mismatch: spark={len(got)} duckdb={len(want)}"
    )
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"[{key}] value mismatch; first diffs (spark, duckdb): {diffs}")
