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


def spark_hex15_to_bigint_sql(hex_expr: str) -> str:
    """Spark-side fast path: one ``conv`` call instead of 15 substr/instr
    terms. Produces the identical value as :func:`hex15_to_bigint_sql`
    (which remains the DuckDB-oracle form — DuckDB has no ``conv``);
    equality of the two forms is pinned by tests/test_extensions.py."""
    return f"CAST(conv(substr({hex_expr}, 1, 15), 16, 10) AS BIGINT)"


#: MinHash reseeding modulus (2^31 - 1, prime). MinHash computes ONE
#: base md5 per shingle and derives the per-seed hash family by an
#: affine map h_s = (a_s·h + b_s) mod P — 1 md5 instead of n_hashes
#: md5s per shingle. 31-bit range keeps a_s·h inside signed-64 exact
#: arithmetic in both engines (no overflow, DuckDB would raise).
MINHASH_P = 2_147_483_647
_MINHASH_A0 = 999_983
_MINHASH_B0 = 122_949_829


def minhash_affine(seed: int) -> tuple[int, int]:
    """Deterministic per-seed affine coefficients (a non-zero)."""
    return (
        _MINHASH_A0 * (seed + 1) % MINHASH_P,
        _MINHASH_B0 * (seed + 1) % MINHASH_P,
    )


def seeded_hash60_sql(value_expr: str, seed_expr: str) -> str:
    """Portable seeded 60-bit hash: ``h = hex15(md5(value || '#' || seed))``.

    ``value_expr``/``seed_expr`` are SQL fragments; the result text runs
    unchanged in Spark SQL and DuckDB.
    """
    return hex15_to_bigint_sql(f"md5(concat({value_expr}, '#', CAST({seed_expr} AS STRING)))")


def seeded_hash60(value_sql: str, seed_sql: str) -> Column:
    """Spark Column computing the portable seeded hash. Arguments are SQL
    fragments (column names or expressions), so the Spark plan and the
    oracle evaluate the exact same expression text.

    NOTE: the md5 sub-expression appears once per hex digit (15×) in
    this single-Column form; prefer :func:`with_seeded_hash60`, which
    materializes the md5 in its own projection so the plan computes it
    exactly once per row.
    """
    return F.expr(seeded_hash60_sql(value_sql, seed_sql))


def with_seeded_hash60(df, out_col: str, value_sql: str, seed_sql: str):
    """Append ``out_col`` = portable seeded hash of ``value_sql`` with
    ``seed_sql``, computing the underlying md5 ONCE per row.

    Two stacked projections: the md5 hex lands in a temp column, the
    15-digit arithmetic reads that column. Catalyst's CollapseProject
    deliberately keeps non-cheap aliases referenced >1× in their own
    Project, so the md5 is evaluated once (verified: the physical plan
    contains a single ``md5`` call vs 15 for the inline form)."""
    tmp = f"__hx_{out_col}"
    return (
        df.withColumn(
            tmp, F.expr(f"md5(concat({value_sql}, '#', CAST({seed_sql} AS STRING)))")
        )
        .withColumn(out_col, F.expr(spark_hex15_to_bigint_sql(tmp)))
        .drop(tmp)
    )


def seeded_hash60_col(value: Column, seed: str) -> Column:
    """Column-composed form of the portable seeded hash (the ``conv``
    fast path) — for use inside higher-order-function lambdas, where
    ``F.expr`` SQL text cannot reference the lambda variable.
    Value-identical to :func:`seeded_hash60_sql`'s digit arithmetic
    (conv-vs-digits equality is pinned in tests)."""
    return F.conv(
        F.substring(F.md5(F.concat(value, F.lit("#"), F.lit(seed))), 1, 15), 16, 10
    ).cast("long")


def portable_ln_micro_sql(ratio_sql: str, k: int = 20) -> str:
    """Engine-portable ``round(ln(ratio)·10⁶)`` as SQL text valid in
    BOTH dialects — built ONLY from IEEE-exact primitives, so Spark
    and DuckDB compute the bit-identical double and the rounded micro
    value can never diverge (native ``ln`` differs between JVM and
    libm in the last ulp, which flips a unit whenever the true value
    sits at a .5 micro boundary — observed in practice on PSI bins).

    Method: k-fold sqrt range reduction (sqrt is correctly rounded by
    IEEE 754 in both engines) pulls the ratio to 1+s with
    |s| ≲ |ln r|/2^k ≤ ~10⁻⁵, then the cubic Mercator series
    ln(1+s) ≈ s − s²/2 + s³/3 evaluated in a FIXED op order; total
    absolute error ~10⁻¹⁰ (validated against math.log across
    [10⁻⁶, 10⁶]) — five orders below a micro unit, and identical on
    both engines regardless."""
    inner = f"({ratio_sql})"
    for _ in range(k):
        inner = f"sqrt({inner})"
    s = f"({inner} - 1.0)"
    poly = f"(({s} - ({s} * {s}) / 2.0) + (({s} * {s}) * {s}) / 3.0)"
    return f"CAST(round({float(2 ** k)} * {poly} * 1000000.0, 0) AS BIGINT)"
