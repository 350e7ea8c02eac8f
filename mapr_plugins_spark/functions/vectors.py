"""Vector math over ``array<float>`` columns, JVM-side.

Built from ``zip_with`` / ``aggregate`` higher-order functions so the hot
path stays inside whole-stage codegen — no Python round trip. Used by the
similarity-search operators (SURVEY §2 north-star rows).

Accumulation is in DOUBLE (left fold over array order — deterministic for
a given row regardless of partitioning, since arrays are row-local).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two float arrays, as DOUBLE."""
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a float array, as DOUBLE."""
    a = _c(a)
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float arrays, as DOUBLE (NaN-safe: 0-norm → NULL)."""
    a, b = _c(a), _c(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize a float array (DOUBLE elements; NULL if 0-norm)."""
    a = _c(a)
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n))


def max_abs(a: Column | str) -> Column:
    """Largest |element| of a float array, as DOUBLE."""
    a = _c(a)
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
