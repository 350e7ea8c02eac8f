"""Engine-portable deterministic hashing.

MinHash/SimHash need hash functions that produce the SAME integer in
Spark and in the DuckDB oracle. Neither engine's native hash matches the
other (Spark xxhash64 vs DuckDB hash), but both have md5 over strings
and the same ``instr``/``substr`` semantics — so we parse the first 15
hex chars of md5 (60 bits, fits a signed BIGINT) with an arithmetic
expression whose SQL text is valid in BOTH dialects.

Scale note: this is whole-stage-codegen'd expression work (md5 + a few
dozen integer ops per value) — no Python, no shuffle; it scales linearly
and is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hex15_to_bigint_sql(hex_expr: str) -> str:
    """SQL (valid in Spark SQL *and* DuckDB) turning the first 15 hex
    chars of ``hex_expr`` into a BIGINT via positional digit arithmetic."""
    # CAST the power-of-16 weights to BIGINT explicitly: small powers
    # parse as INT literals and the digit*weight product overflows int32
    # under Spark 4's default ANSI mode.
    terms = [
        f"(instr('{_HEX}', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def seeded_hash60_sql(value_expr: str, seed_expr: str) -> str:
    """Portable seeded 60-bit hash: ``h = hex15(md5(value || '#' || seed))``.

    ``value_expr``/``seed_expr`` are SQL fragments; the result text runs
    unchanged in Spark SQL and DuckDB.
    """
    return hex15_to_bigint_sql(f"md5(concat({value_expr}, '#', CAST({seed_expr} AS STRING)))")


def seeded_hash60(value_sql: str, seed_sql: str) -> Column:
    """Spark Column computing the portable seeded hash. Arguments are SQL
    fragments (column names or expressions), so the Spark plan and the
    oracle evaluate the exact same expression text."""
    return F.expr(seeded_hash60_sql(value_sql, seed_sql))
