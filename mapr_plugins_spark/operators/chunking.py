"""Document chunking and sequence packing for LLM training pipelines.

Two pre-tokenization layout operators the reference's host pipelines
leave to downstream jobs (the reference itself is a connector bundle —
`MapRStreamingSource.java` / `MapRDBJSONSink.java` move records, they
never reshape them):

- ``chunk_tokens``: split each document into overlapping token windows
  (max_tokens window, fixed stride). Pure row-local work — sequence +
  posexplode + slice higher-order expressions, whole-stage codegen'd,
  ZERO shuffle; at 100 TB it runs as a map-only pass at scan
  parallelism.
- ``pack_sequences``: greedy sequential bin packing of documents into
  fixed token budgets (context windows). Packing is inherently a
  sequential fold, so it is parallelized the way production packers
  are: hash documents into independent buckets, pack each bucket's
  doc_id-ordered stream sequentially inside one Arrow-batched
  ``applyInPandas`` task. One shuffle (the bucket exchange); bucket
  count scales with the cluster, per-bucket state is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from mapr_plugins_spark.functions.portable_hash import with_seeded_hash60
from mapr_plugins_spark.operators.text import tokens_col
from mapr_plugins_spark.plans.partitioning import fan_out


def chunk_tokens(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token windows of ``max_tokens`` with
    ``overlap`` tokens shared between consecutive chunks.

    Window starts are ``0, step, 2*step, ...`` with
    ``step = max_tokens - overlap``; the number of chunks is the
    smallest count whose windows cover all tokens (1 for empty/short
    docs). Output: ``id_col, chunk_id, start_tok, n_tokens,
    chunk_text``.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    d = (
        fan_out(df.select(id_col, text_col))
        .withColumn("__toks", tokens_col(text_col))
        .withColumn("__n", F.size("__toks"))
        .withColumn(
            "__nc",
            F.when(F.col("__n") <= max_tokens, F.lit(1)).otherwise(
                F.lit(1)
                + F.expr(f"CAST((__n - {max_tokens} + {step} - 1) DIV {step} AS BIGINT)")
            ),
        )
    )
    start = (F.col("chunk_id") * step).cast("long")
    sliced = F.slice("__toks", F.col("start_tok").cast("int") + 1, max_tokens)
    return (
        d.select(
            id_col,
            F.posexplode(F.sequence(F.lit(1), F.col("__nc"))).alias("chunk_id", "__i"),
            "__toks",
        )
        .drop("__i")
        .withColumn("start_tok", start)
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "start_tok",
            F.size(sliced).cast("long").alias("n_tokens"),
            F.array_join(sliced, " ").alias("chunk_text"),
        )
    )


def chunk_oracle_sql(max_tokens: int, overlap: int, toks_sql: str) -> str:
    """DuckDB oracle for :func:`chunk_tokens` over the ``documents``
    view (same window-start arithmetic, lateral ``range`` per doc)."""
    step = max_tokens - overlap
    return f"""
        WITH t AS (SELECT doc_id, {toks_sql} AS toks FROM documents),
        s AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) <= {max_tokens} THEN 1
                        ELSE 1 + (len(toks) - {max_tokens} + {step} - 1) // {step}
                   END AS nc
            FROM t
        ),
        g AS (
            SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM s
        )
        SELECT doc_id,
               i AS chunk_id,
               i * {step} AS start_tok,
               len(list_slice(toks, i * {step} + 1,
                              i * {step} + {max_tokens})) AS n_tokens,
               array_to_string(list_slice(toks, i * {step} + 1,
                                          i * {step} + {max_tokens}),
                               ' ') AS chunk_text
        FROM g
    """


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential packing: within each hash bucket, stream docs
    in ``id_col`` order and open a new bin whenever the current doc
    would push the bin past ``budget`` tokens. Docs longer than the
    budget get a bin of their own.

    Deterministic (portable hash bucket + id order), one shuffle, and
    each bin is a contiguous id-run within its bucket — the property
    samplers rely on. Output: ``id_col, bucket, bin_id, n_tokens``.
    """
    d = with_seeded_hash60(
        df.select(id_col, text_col),
        "__h",
        f"CAST({id_col} AS STRING)",
        "0",
    ).select(
        id_col,
        (F.col("__h") % n_buckets).cast("long").alias("bucket"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("bucket", LongType()),
            StructField("bin_id", LongType()),
            StructField("n_tokens", LongType()),
        ]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            if first:
                fill = n
                first = False
            elif fill + n <= budget:
                fill += n
            else:
                bin_id += 1
                fill = n
            bins.append(bin_id)
        pdf["bin_id"] = bins
        return pdf[[id_col, "bucket", "bin_id", "n_tokens"]]

    return d.groupBy("bucket").applyInPandas(_pack, schema)


def pack_oracle_sql(budget: int, n_buckets: int, toks_sql: str, hash_sql: str) -> str:
    """DuckDB oracle for :func:`pack_sequences`: the greedy fold as a
    row-by-row recursive CTE (one recursion step per within-bucket row
    index, all buckets advanced simultaneously)."""
    return f"""
        WITH RECURSIVE base AS (
            SELECT doc_id,
                   ({hash_sql}) % {n_buckets} AS bucket,
                   CAST(len({toks_sql}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        seq AS (
            SELECT doc_id, bucket, n_tokens,
                   row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM base
        ),
        pack AS (
            SELECT doc_id, bucket, n_tokens, rn,
                   CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT n.doc_id, n.bucket, n.n_tokens, n.rn,
                   CASE WHEN p.fill + n.n_tokens <= {budget}
                        THEN p.bin_id ELSE p.bin_id + 1 END,
                   CASE WHEN p.fill + n.n_tokens <= {budget}
                        THEN p.fill + n.n_tokens ELSE n.n_tokens END
            FROM pack p JOIN seq n
              ON n.bucket = p.bucket AND n.rn = p.rn + 1
        )
        SELECT doc_id, bucket, bin_id, n_tokens FROM pack
    """
