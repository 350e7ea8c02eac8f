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


def run_duckdb(sql: str, sf_dir: str) -> list[dict[str, Any]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return [dict(zip(cols, row)) for row in cur.fetchall()]
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ROUND_DP)
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
    return [r.asDict(recursive=True) for r in df.collect()]


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, key: str = "?") -> None:
    got = canonicalize(spark_rows(spark_df))
    want = canonicalize(run_duckdb(oracle_sql, sf_dir))
    assert len(got) == len(want), (
        f"[{key}] row count mismatch: spark={len(got)} duckdb={len(want)}"
    )
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"[{key}] value mismatch; first diffs (spark, duckdb): {diffs}")
