"""Iterative graph computation: deterministic damped PageRank.

Corpus-curation pipelines weight sources by link-graph centrality
(PageRank/harmonic-style authority scores over the crawl graph — the
public CommonCrawl/CCNet-style quality signal). The engine realizes the
fixpoint iteration as plain DataFrame rounds — the same shape as the
distributed min-label fallback in ``dedup.collapse_components``:

* per round, contributions flow along edges and are summed per
  destination — ONE grouped aggregation (map-side combined), shuffle
  bounded by |edges|;
* arithmetic is FIXED-POINT INTEGER (ranks in millionths, floor
  division by outdeg): float ``rank/outdeg`` hits representable
  decimal midpoints at power-of-two outdegrees, where Spark rounds
  HALF_UP and DuckDB HALF_EVEN — integer micro-units make every round
  bit-exact in both engines by construction (the same philosophy as
  the log-free idf rationals);
* lineage is truncated per round via ``localCheckpoint`` so a deep
  iteration count cannot blow up the plan.

At 100 TB: |edges| ≫ memory is fine (every round is shuffle-bounded
dataflow, no driver state); convergence-driven stopping would add one
``count`` per round exactly like ``collapse_components`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: ranks are BIGINT millionths of a rank unit.
SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_permille: int = 850,
) -> DataFrame:
    """Damped PageRank over a directed edge list, fixed iteration
    count, fixed-point integer arithmetic: ``(id, rank_micro)`` with

        rank' = (1000 - damping_permille)·SCALE/1000
                + damping_permille · Σ_in (rank // outdeg) // 1000

    per round (all BIGINT; every operation exact and engine-portable —
    headroom check: Σ contributions ≤ n·SCALE, so the damping product
    stays inside int64 up to ~10¹⁰ nodes). Callers model undirected
    graphs by passing both edge directions; nodes absent from the src
    side would be dangling (their mass leaks — the standard
    simplification), so with bidirectional input every node has
    outdeg ≥ 1 and the node set is exactly the distinct src side.
    """
    teleport_micro = (1000 - damping_permille) * SCALE // 1000
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = edges.select(F.col("src").alias("id")).distinct().persist()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").persist()
    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("bigint"))
    for _ in range(iterations):
        contrib = e.join(ranks, e.src == ranks.id).select(
            F.col("dst").alias("id"),
            F.expr("rank_micro div outdeg").alias("c"),
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport_micro).cast("bigint")
                    + F.expr(
                        f"({damping_permille} * coalesce(s, CAST(0 AS BIGINT))) div 1000"
                    )
                ).alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return ranks
