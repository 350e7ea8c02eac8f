from mapr_plugins_spark.functions.deterministic import dsum, davg, dsum_sql, davg_sql
from mapr_plugins_spark.functions.vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "dsum",
    "davg",
    "dsum_sql",
    "davg_sql",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
