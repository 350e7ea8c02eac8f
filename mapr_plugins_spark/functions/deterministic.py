"""Deterministic (engine-portable) aggregate helpers.

Floating-point SUM/AVG over a shuffled dataset is order-dependent: two
engines (or two runs at different parallelism) legitimately produce
results differing in the last ulps. The t2 gate hash-compares Spark
results against a DuckDB oracle, so every money-valued aggregate in the
declared query set goes through these helpers:

* per-row arithmetic stays in IEEE double (bit-identical across engines),
* the row value is cast to DECIMAL(18,6) (round-to-nearest),
* the SUM runs in exact decimal arithmetic (associative ⇒ order-free),
* the final value is cast back to DOUBLE (single well-defined rounding).

Midpoint caveat: the decimal cast TIES when a double is exactly
representable as a 7-decimal-digit value ending in 5 — i.e. odd/128
scaled by a power of ten (odd/2^k for k≠7 ends in …25/…75/…125 etc.,
never a bare trailing 5-then-zeros). Spark resolves ties HALF_UP,
DuckDB HALF_EVEN — divergence. Money columns (≤2 dp) and
full-mantissa doubles can't tie; LOW-DENOMINATOR DYADIC RATIONALS CAN
(observed: a quality score containing stopwords/128 at sf0.01).
For such columns use value-picking aggregates (MIN/MAX — picks of
bit-identical values) or integer fixed-point (x_pagerank) instead.

This is also the right 100 TB posture: decimal partial aggregation is
still map-side combined by Catalyst, and exactness means a re-run or a
different shuffle plan can never flip a downstream comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def dsum(expr: Column | str, name: str) -> Column:
    """Order-independent SUM of a double expression, as DOUBLE."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(_DEC)).cast("double").alias(name)


def davg(expr: Column | str, name: str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double."""
    col = F.col(expr) if isinstance(expr, str) else expr
    total = F.sum(col.cast(_DEC)).cast("double")
    cnt = F.count(col).cast("double")
    return (total / cnt).alias(name)


def dsum_sql(expr: str, name: str) -> str:
    """DuckDB-side equivalent of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {name}"


def davg_sql(expr: str, name: str) -> str:
    """DuckDB-side equivalent of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {name}"
    )
