"""Deterministic global row indexing without a global sort.

``monotonically_increasing_id`` is partition-layout-dependent and a
single-partition ``row_number()`` window dies at scale. The scalable
classic: range-partition on the order key, locally sort, compute the
(tiny) per-partition histogram, prefix-sum it into offsets, and add the
offset to a per-partition local sequence — one range shuffle over the
data, everything else metadata-sized.

The local sequence is assigned by an Arrow-batched ``mapInPandas`` that
counts rows in partition order (batches arrive in order within a
partition), so no second shuffle is needed for the window. With a
unique order key the resulting index is a pure function of the data —
stable across reruns, partition counts, and engines.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "row_idx",
    n_parts: int | None = None,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Append a dense 0..N-1 ``index_col`` ordered by ``order_col``
    (which must be unique for the index to be deterministic — or pass
    ``tie_cols`` to extend the sort key into a total order; the range
    partitioner and the local sort then share the same composite key,
    so ties of ``order_col`` straddling a partition boundary still
    index deterministically)."""
    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    # per-partition local row number JVM-side: the documented layout of
    # monotonically_increasing_id is (partitionId << 33) | rowNumber, so
    # masking the low 33 bits yields the 0-based position within the
    # sorted partition — no Python, no Arrow transfer, no extra shuffle
    local = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    keys = [order_col, *tie_cols]
    d = (
        df.repartitionByRange(n, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local", local)
        .persist()  # histogram pass + data pass read the same layout
    )
    sizes = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "__pid", F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__off")
    )

    with_off = d.join(F.broadcast(offsets), "__pid")
    return (
        with_off.withColumn(index_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__off", "__local")
    )
