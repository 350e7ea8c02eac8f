"""Oracle-differential + behavioral tests for the north-star extension
operators (dedup / similarity / text / multimodal / as-of join)."""

from __future__ import annotations

import pytest

from mapr_plugins_spark.operators import registry as R


@pytest.mark.parametrize("key", sorted(R.extension_oracles()))
def test_extension_matches_oracle(spark, sf_dir, key):
    from tests.oracle_harness import assert_matches_oracle

    df = R.extension_queries()[key](spark, sf_dir)
    assert_matches_oracle(df, R.extension_oracles()[key], sf_dir, key=key)


def test_minhash_finds_injected_near_dups(spark, sf_dir):
    """Every injected variant (id+1000000, first word dropped) must pair
    with its source doc at jaccard >= 0.5."""
    pairs = R.x_dedup_minhash_pairs(spark, sf_dir)
    rows = {(r.id_a, r.id_b) for r in pairs.collect()}
    docs = R.q22_exact_dedup(spark, sf_dir).count() // 1  # doc count via dedup
    n_docs = R.x_text_tokens(spark, sf_dir).count()
    found = sum((i, i + 1000000) in rows for i in range(n_docs))
    assert found >= 0.9 * n_docs, f"only {found}/{n_docs} injected near-dups found"


def test_incremental_dedup_covers_injected_wave(spark, sf_dir):
    """Every injected delta doc must pair with its corpus source, and
    every emitted pair must be strictly cross-side (corpus, delta) —
    the incremental path must never re-pair the corpus with itself."""
    pairs = {(r.id_a, r.id_b) for r in R.x_dedup_incremental(spark, sf_dir).collect()}
    n_docs = R.x_text_tokens(spark, sf_dir).count()
    found = sum((i, i + 1000000) in pairs for i in range(n_docs))
    assert found >= 0.9 * n_docs, f"only {found}/{n_docs} injected near-dups found"
    assert all(a < 1000000 <= b for a, b in pairs)


def test_pagerank_centrality_orders_by_degree(spark, sf_dir):
    """Suppliers (few nodes, many in-edges) must outrank customers on
    average, and total rank mass must stay near n·SCALE (teleport +
    damping conserve mass up to floor-division loss)."""
    from mapr_plugins_spark.operators.graph import SCALE

    rows = R.x_pagerank(spark, sf_dir).collect()
    sup = [r.rank_micro for r in rows if r.node.startswith("s")]
    cus = [r.rank_micro for r in rows if r.node.startswith("c")]
    assert sup and cus
    assert sum(sup) / len(sup) > 2 * sum(cus) / len(cus)
    total = sum(r.rank_micro for r in rows)
    assert 0.8 * len(rows) * SCALE <= total <= 1.01 * len(rows) * SCALE


def test_cdc_chunk_dedup_is_shift_robust(spark, sf_dir):
    """Content-defined boundaries re-align after the dropped prefix, so
    most injected variants must pair with their source at jaccard ≥ 0.5
    — the property fixed-block hashing lacks (a 1-word shift would
    change every block)."""
    pairs = {(r.id_a, r.id_b) for r in R.x_cdc_chunk_dedup(spark, sf_dir).collect()}
    n_docs = R.x_text_tokens(spark, sf_dir).count()
    found = sum((i, i + 1000000) in pairs for i in range(n_docs))
    assert found >= 0.7 * n_docs, f"only {found}/{n_docs} shifted near-dups found"


def test_cdc_chunk_freq_cap_trades_recall_not_precision(spark):
    """The ``max_chunk_freq`` scale valve drops ultra-common chunks
    from CANDIDATE generation only: a pair linked by a rare chunk
    survives with the SAME exact jaccard as the uncapped run (scored
    over full arrays), a pair whose only shared chunks are corpus-wide
    boilerplate disappears, and ``None`` reproduces the uncapped pairs
    exactly."""
    from mapr_plugins_spark.operators.dedup import cdc_chunk_dedup_pairs

    boiler = "the common boilerplate header attached to every document in this corpus. "
    rare = "zqx unique payload shared by exactly two documents only zqx. "
    rows = [(1, boiler + rare), (2, boiler + rare + "tail one.")]
    rows += [(i, boiler + f"filler body number {i} with its own words {i}.") for i in range(3, 40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in cdc_chunk_dedup_pairs(docs, threshold=0.3).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in cdc_chunk_dedup_pairs(docs, threshold=0.3, max_chunk_freq=5).collect()
    }
    none_again = {
        (r.id_a, r.id_b): r.jaccard
        for r in cdc_chunk_dedup_pairs(docs, threshold=0.3, max_chunk_freq=None).collect()
    }
    assert none_again == uncapped
    assert (1, 2) in capped, "rare-chunk pair must survive the cap"
    assert capped[(1, 2)] == uncapped[(1, 2)], "verify must score full arrays"
    assert set(capped) < set(uncapped), "boilerplate-only pairs must be pruned"
    dropped = set(uncapped) - set(capped)
    assert all(1 not in p or 2 not in p for p in dropped)


def test_cdc_chunk_freq_cap_oracle_replays_where_it_bites(spark, sf_dir):
    """The registered x_cdc_chunk_dedup_capped gate (cap=64) drops
    nothing at the small SFs, so on its own it would pass even with a
    mis-replayed valve. This pins the valve's SQL replay at a cap that
    BITES on the real corpus (cap=2 drops ~60 of 545 pairs at
    sf0.001): Spark and DuckDB must agree on exactly which pairs the
    stop-chunk removal prunes."""
    from mapr_plugins_spark.operators.dedup import cdc_chunk_dedup_pairs
    from mapr_plugins_spark.operators.registry import (
        _cdc_chunk_oracle,
        _dedup_corpus,
    )
    from tests.oracle_harness import assert_matches_oracle

    corpus = _dedup_corpus(spark, sf_dir)
    capped = cdc_chunk_dedup_pairs(corpus, threshold=0.5, max_chunk_freq=2)
    uncapped_n = cdc_chunk_dedup_pairs(corpus, threshold=0.5).count()
    assert capped.count() < uncapped_n, "cap=2 must bite at this SF"
    assert_matches_oracle(
        capped,
        _cdc_chunk_oracle(max_chunk_freq=2),
        sf_dir,
        key="cdc_cap_bites",
    )


def test_semantic_dedup_codebook_is_fixed_count(spark, sf_dir):
    """The codebook exhibit's production claim: centroid COUNT is
    corpus-size-independent. Pin the stride arithmetic at several
    corpus sizes (the table stays ≤ 257 entries however the corpus
    grows), and on the real table check assignment totality + the
    SemDeDup survivorship law (lowest id per cluster kept)."""
    from collections import defaultdict

    from mapr_plugins_spark.catalog import table

    for n in (50, 500, 2000, 20000, 10**9):
        stride = (n + 255) // 256
        n_cells = (n - 1) // stride + 1  # vec_ids 0..n-1 ≡ 0 (mod stride)
        assert n_cells <= 257, (n, n_cells)
        assert n_cells >= min(n, 129), (n, n_cells)  # never degenerate
    out = R.x_semantic_dedup_codebook(spark, sf_dir).collect()
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    stride = (n + 255) // 256
    assert len(out) == n  # every vector assigned
    cells = {r.cluster_id for r in out}
    assert all(c % stride == 0 for c in cells)  # the table's own ids
    by_cluster = defaultdict(list)
    for r in out:
        by_cluster[r.cluster_id].append(r)
    for rs in by_cluster.values():
        assert min(rs, key=lambda r: r.vec_id).is_kept


def test_fuzzy_join_cap_drops_exactly_nonrepresentative_pairs(spark, sf_dir):
    """Biting-cap differential for the x_fuzzy_join_capped group-width
    valve (round-11 verdict #2): at this SF the max name-group width
    is 7 > 4, so the cap BITES. The capped output must be EXACTLY the
    uncapped pairs restricted to representatives (both keys rank ≤ 4
    within their name group by ascending key) — set equality on
    (key_a, key_b, dist) triples pins both which pairs drop and that
    surviving distances are untouched."""
    from collections import defaultdict

    from mapr_plugins_spark.catalog import table

    uncapped = {
        (r.key_a, r.key_b, r.dist)
        for r in R.x_fuzzy_join_levenshtein(spark, sf_dir).collect()
    }
    capped = {
        (r.key_a, r.key_b, r.dist)
        for r in R.x_fuzzy_join_capped(spark, sf_dir).collect()
    }
    groups = defaultdict(list)
    for r in table(spark, sf_dir, "part").select("p_partkey", "p_name").collect():
        groups[r.p_name].append(r.p_partkey)
    reps = {k for keys in groups.values() for k in sorted(keys)[:4]}
    expected = {t for t in uncapped if t[0] in reps and t[1] in reps}
    assert capped < uncapped, "cap=4 must bite at this SF"
    assert capped == expected


def test_fuzzy_join_cap_rejects_bad_widths(spark, sf_dir):
    """Cap validation (the trained-centroid-id precedent): zero,
    negative, and non-integral caps raise ValueErrors naming the
    requirement instead of silently emptying or truncating."""
    import pytest

    from mapr_plugins_spark.operators.registry import _fuzzy_name_pairs

    for bad in (0, -1, 2.5):
        with pytest.raises(ValueError, match="integer >= 1"):
            _fuzzy_name_pairs(spark, sf_dir, max_group_width=bad)
    # integral-valued floats pass (same accept rule as centroid ids)
    _fuzzy_name_pairs(spark, sf_dir, max_group_width=4.0)
    # bool is an int subclass (int(True) == True and True >= 1 both
    # hold), so without an explicit check a boolean cap would silently
    # mean "1" — a type confusion, not a width (round-12 advice)
    for bad_bool in (True, False):
        with pytest.raises(ValueError, match="integer >= 1"):
            _fuzzy_name_pairs(spark, sf_dir, max_group_width=bad_bool)


def test_fuzzy_join_cap_is_lossless_at_the_name_level(spark, sf_dir):
    """The valve's recovery law, pinned: the capped output LOSES no
    name-level linkage — every fuzzy name pair survives through at
    least one representative pair (every nonempty group keeps ≥1 of
    its 4 lowest keys, and width-1 groups have no same-name pair to
    lose) — so a consumer reconstructs the FULL uncapped pair set by
    the documented equi-join recipe: capped pairs → name pairs →
    expand through the complete name groups. Exact set equality."""
    from collections import defaultdict

    from mapr_plugins_spark.catalog import table

    uncapped = {
        (r.key_a, r.key_b, r.dist)
        for r in R.x_fuzzy_join_levenshtein(spark, sf_dir).collect()
    }
    capped = R.x_fuzzy_join_capped(spark, sf_dir).collect()
    name_of, groups = {}, defaultdict(list)
    for r in table(spark, sf_dir, "part").select("p_partkey", "p_name").collect():
        name_of[r.p_partkey] = r.p_name
        groups[r.p_name].append(r.p_partkey)
    name_pairs = {
        tuple(sorted((name_of[r.key_a], name_of[r.key_b]))) + (r.dist,)
        for r in capped
    }
    rebuilt = set()
    for nx, ny, d in name_pairs:
        if nx == ny:
            ks = sorted(groups[nx])
            rebuilt |= {(a, b, d) for i, a in enumerate(ks) for b in ks[i + 1 :]}
        else:
            rebuilt |= {
                (min(a, b), max(a, b), d) for a in groups[nx] for b in groups[ny]
            }
    assert rebuilt == uncapped


def test_record_linkage_laws(spark, sf_dir):
    """Fellegi–Sunter exhibit invariants: (a) every emitted pair shares
    its block (first name-word AND size decade) — candidates never
    leave the blocking scheme; (b) the per-block representative cap
    holds — every emitted key ranks ≤ 8 by partkey within its block;
    (c) exact attribute-duplicates among representatives always score
    'match' (all four agreement weights fire: 4,681,000 ≥ upper); and
    (d) score_micro is exactly the CASE-sum of the four fixed weights,
    recomputed independently per pair."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.reg_dedup import (
        _FS_BLOCK_WIDTH,
        _FS_LOWER,
        _FS_UPPER,
        _FS_WEIGHTS,
        x_record_linkage,
    )

    rows = {r.p_partkey: r for r in table(spark, sf_dir, "part").collect()}
    from collections import defaultdict

    blocks = defaultdict(list)
    for k, r in rows.items():
        blocks[(r.p_name.split(" ")[0], r.p_size // 10)].append(k)
    rank = {}
    for ks in blocks.values():
        for i, k in enumerate(sorted(ks)):
            rank[k] = i + 1

    out = x_record_linkage(spark, sf_dir).collect()
    assert out, "linkage must emit pairs at every graded sf"
    weights = {f: (m, u) for f, m, u in _FS_WEIGHTS}
    n_match = 0
    for p in out:
        a, b = rows[p.key_a], rows[p.key_b]
        assert a.p_name.split(" ")[0] == b.p_name.split(" ")[0]
        assert a.p_size // 10 == b.p_size // 10
        assert rank[p.key_a] <= _FS_BLOCK_WIDTH and rank[p.key_b] <= _FS_BLOCK_WIDTH
        expect = (
            weights["name_eq"][0 if a.p_name == b.p_name else 1]
            + weights["brand_eq"][0 if a.p_brand == b.p_brand else 1]
            + weights["type_eq"][0 if a.p_type == b.p_type else 1]
            + weights["size_close"][0 if abs(a.p_size - b.p_size) <= 2 else 1]
        )
        assert p.score_micro == expect
        assert p.score_micro >= _FS_LOWER
        assert p.verdict == ("match" if p.score_micro >= _FS_UPPER else "possible")
        if (a.p_name, a.p_brand, a.p_type, a.p_size) == (
            b.p_name,
            b.p_brand,
            b.p_type,
            b.p_size,
        ):
            # full-quadruple duplicates (when present) always match:
            # all four agreement weights fire, 4,681,000 ≥ upper
            assert p.verdict == "match"
        n_match += p.verdict == "match"
    assert n_match > 0, "the match class must be non-empty at every graded sf"


def test_semantic_codebook_band_guard_rejects_sparse_ids(spark, tmp_path):
    """x_semantic_dedup_codebook's fixed-~256-cell property rides on the
    testdata's DENSE 0..n-1 vec_ids; with sparse/offset ids the
    ``vec_id % stride == 0`` sample can select far fewer (or zero)
    centroids. The band assert must name that assumption loudly instead
    of falling through to a generic empty-centroids error downstream
    (round-12 advice). All-odd ids with stride 2 select exactly zero."""
    n = 300  # stride = (300 + 255) // 256 = 2; odd ids never hit % 2 == 0
    rows = [(2 * i + 1, [float(i % 7)] * 64, 0) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    with pytest.raises(ValueError, match=r"\[128, 512\]"):
        R.x_semantic_dedup_codebook(spark, str(tmp_path))


def test_semantic_dedup_invariants(spark, sf_dir):
    """One row per vector; every cluster keeps at least one member, and
    the lowest-id member of each cluster is always kept (it has no
    lower-id neighbor to dominate it)."""
    from collections import defaultdict

    from mapr_plugins_spark.catalog import table

    out = R.x_semantic_dedup(spark, sf_dir).collect()
    assert len(out) == table(spark, sf_dir, "embeddings").count()
    by_cluster = defaultdict(list)
    for r in out:
        by_cluster[r.cluster_id].append(r)
    for rs in by_cluster.values():
        assert min(rs, key=lambda r: r.vec_id).is_kept


def test_centroid_cell_udf_matches_reference_kernel(spark, sf_dir):
    """The pandas-UDF routing body is an inlined copy of the
    module-level _route_cells_int64 (closures must pickle by value —
    workers may not have the package importable): pin the two paths
    identical on the real embeddings table so they can never drift."""
    import numpy as np

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import (
        _centroid_cell_udf,
        _route_cells_int64,
    )

    emb = table(spark, sf_dir, "embeddings")
    quant, cell_udf = _centroid_cell_udf(emb, "vec_id", "embedding")
    got = {
        r.vec_id: r.cell
        for r in emb.select("vec_id", cell_udf(quant).alias("cell")).collect()
    }
    rows = sorted(
        emb.select("vec_id", quant.alias("q")).collect(), key=lambda r: r.vec_id
    )
    qmat = np.asarray([[int(v) for v in r.q] for r in rows], dtype=np.int64)
    n_cells = max(8, len(rows) // 128)
    want = _route_cells_int64(qmat, qmat[:n_cells])
    assert got == {r.vec_id: int(c) for r, c in zip(rows, want)}


def test_centroid_cell_count_guard_is_loud(spark, sf_dir):
    """Past _MAX_CENTROID_CELLS the seed collect itself is the scale
    hazard (the closure ships count//occupancy rows — linear in the
    corpus): the kernel must REFUSE loudly, not silently OOM executors
    (round-9 advice; the bounded_broadcast standard)."""
    import pytest

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import (
        _MAX_CENTROID_CELLS,
        _centroid_cell_udf,
    )

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="_MAX_CENTROID_CELLS"):
        _centroid_cell_udf(
            emb, "vec_id", "embedding", fixed_cells=_MAX_CENTROID_CELLS + 1
        )
    # the refusal must name the real escape hatch: a pre-trained
    # centroid TABLE (round-10 advice: the old wording oversold
    # fixed_cells, which is only an int count)
    with pytest.raises(ValueError, match="centroids TABLE"):
        _centroid_cell_udf(
            emb, "vec_id", "embedding", fixed_cells=_MAX_CENTROID_CELLS + 1
        )


def test_trained_centroids_path_on_ivf_index(spark, sf_dir):
    """The >16.7M-vector production path (round-10 verdict #2): the
    centroid-cell kernel must accept the IVF index's PERSISTED coarse
    quantizer as its centroid set, decoupling cell count from corpus
    size. Exercises semantic_dedup and embedding_near_dup_pairs on the
    real persisted table: cluster ids are the table's own list_id
    values, every vector is assigned, and the SemDeDup survivorship
    law (lowest id per cluster kept) holds unchanged."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup,
    )
    from mapr_plugins_spark.operators.registry import _ensure_staged, _ivf_index_dir
    from mapr_plugins_spark.operators.similarity import ivf_index_write

    emb = table(spark, sf_dir, "embeddings")
    d = _ivf_index_dir(sf_dir)
    _ensure_staged(d, lambda tmp: ivf_index_write(emb, tmp, n_lists=16))
    cents = spark.read.parquet(f"{d}/centroids")
    list_ids = {r.list_id for r in cents.collect()}

    out = semantic_dedup(emb, centroids=cents).collect()
    assert len(out) == emb.count()  # every vector assigned
    assert {r.cluster_id for r in out} <= list_ids  # table's own ids
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for rs in by_cluster.values():
        assert min(rs, key=lambda r: r.vec_id).is_kept

    pairs = embedding_near_dup_pairs(emb, centroids=cents)
    assert pairs.columns == ["id_a", "id_b", "cos6"]
    assert all(r.id_a < r.id_b for r in pairs.collect())


def test_trained_centroids_match_default_seeds(spark, sf_dir):
    """Quantization parity pin: a trained-centroid table holding
    EXACTLY the default path's lowest-id seed vectors (raw doubles,
    cell_id = seed rank) must reproduce the default assignment
    bit-for-bit — the driver-side ``math.floor(x·1e6)`` and the
    Spark-side ``floor(cast(x as double)·1e6)`` micro-unit rules are
    the same IEEE arithmetic, so the two provenances can never
    drift."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import semantic_dedup

    emb = table(spark, sf_dir, "embeddings")
    n_cells = max(8, emb.count() // 128)
    seed_rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )[:n_cells]
    cents = spark.createDataFrame(
        [(i, [float(x) for x in r.embedding]) for i, r in enumerate(seed_rows)],
        "cell_id INT, centroid ARRAY<DOUBLE>",
    )
    default = {r.vec_id: r.cluster_id for r in semantic_dedup(emb).collect()}
    trained = {
        r.vec_id: r.cluster_id
        for r in semantic_dedup(emb, centroids=cents).collect()
    }
    assert trained == default


def test_trained_centroids_reject_duplicate_ids(spark, sf_dir):
    """Duplicate cell ids would make both the coarse-prefix order and
    the emitted cell names ambiguous — refuse loudly."""
    import pytest

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import _centroid_cell_udf

    emb = table(spark, sf_dir, "embeddings")
    dup = spark.createDataFrame(
        [(0, [0.0] * 64), (0, [1.0] * 64)], "cell_id INT, centroid ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="duplicate"):
        _centroid_cell_udf(emb, "vec_id", "embedding", centroids=dup)


def test_trained_centroids_reject_bad_ids_and_null_vectors(spark, sf_dir):
    """Round-11 advice: int() on a non-integral cell id silently
    truncates — which can mis-order the id-sorted coarse prefix or
    spuriously trip the duplicate-id guard — and NULL ids/vectors used
    to surface as opaque TypeErrors. All three must raise a ValueError
    naming the requirement."""
    import pytest

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import _centroid_cell_udf

    emb = table(spark, sf_dir, "embeddings")
    frac = spark.createDataFrame(
        [(0.0, [0.0] * 64), (1.5, [1.0] * 64)],
        "cell_id DOUBLE, centroid ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="non-integral"):
        _centroid_cell_udf(emb, "vec_id", "embedding", centroids=frac)
    null_id = spark.createDataFrame(
        [(0, [0.0] * 64), (None, [1.0] * 64)],
        "cell_id INT, centroid ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="NULL"):
        _centroid_cell_udf(emb, "vec_id", "embedding", centroids=null_id)
    null_vec = spark.createDataFrame(
        [(0, [0.0] * 64), (1, None)], "cell_id INT, centroid ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="NULL"):
        _centroid_cell_udf(emb, "vec_id", "embedding", centroids=null_vec)
    null_comp = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [None] + [1.0] * 63)],
        "cell_id INT, centroid ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="NULL component"):
        _centroid_cell_udf(emb, "vec_id", "embedding", centroids=null_comp)
    # integral-VALUED ids in a float column are fine (the documented
    # escape is a BIGINT cast, but exact values must not be rejected)
    ok = spark.createDataFrame(
        [(0.0, [0.0] * 64), (1.0, [1.0] * 64)],
        "cell_id DOUBLE, centroid ARRAY<DOUBLE>",
    )
    _centroid_cell_udf(emb, "vec_id", "embedding", centroids=ok)
    # NaN/inf ids: int() raises before the integrality comparison can
    # run, so the guard must catch that and still raise the SAME named
    # error, not a bare float-conversion traceback (round-12 advice)
    for bad in (float("nan"), float("inf"), float("-inf")):
        weird = spark.createDataFrame(
            [(0.0, [0.0] * 64), (bad, [1.0] * 64)],
            "cell_id DOUBLE, centroid ARRAY<DOUBLE>",
        )
        with pytest.raises(ValueError, match="non-integral"):
            _centroid_cell_udf(emb, "vec_id", "embedding", centroids=weird)


def test_trained_centroids_guardrails(spark, sf_dir, monkeypatch):
    """Round-11 review findings: (a) centroids= and fixed_cells= are
    mutually exclusive — silently ignoring one would let a migrating
    caller misattribute changed cluster granularity; (b) the
    _MAX_CENTROID_CELLS cap on a trained table is enforced by a
    LIMIT cap+1 BEFORE the collect, so an accidentally corpus-sized
    centroids= argument raises loudly instead of OOMing the driver on
    the very collect the cap exists to prevent."""
    import pytest

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators import dedup as D

    emb = table(spark, sf_dir, "embeddings")
    small = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64)], "cell_id INT, centroid ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="not both"):
        D._centroid_cell_udf(
            emb, "vec_id", "embedding", centroids=small, fixed_cells=4
        )
    # shrink the cap so a 3-row "oversized" table trips it without
    # materializing 131k rows; the guard must fire on row COUNT via
    # the pre-collect limit, whatever the table holds
    monkeypatch.setattr(D, "_MAX_CENTROID_CELLS", 2)
    big = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(3)],
        "cell_id INT, centroid ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="train fewer centroids"):
        D._centroid_cell_udf(emb, "vec_id", "embedding", centroids=big)


def test_embcos_high_cosine_twins_co_assign(spark, sf_dir):
    """Round-9 sub-blocking recall premise (SemDeDup): a vector and a
    near-identical twin (cos ≈ 1) must land in the same centroid cell
    and be mined as a pair — the (label, cell) blocking trades recall
    only at the threshold boundary, never on true near-duplicates."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.dedup import embedding_near_dup_pairs

    emb = table(spark, sf_dir, "embeddings")
    twins = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x.cast("double") * F.lit(1.0009765625)).cast("float"),
        ).alias("embedding"),
        "label",
    )
    planted = emb.unionByName(twins)
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(planted, threshold=0.9).collect()
    }
    ids = [r.vec_id for r in emb.filter(F.col("vec_id") % 25 == 0).collect()]
    found = sum((i, i + 1000000) in pairs for i in ids)
    assert found >= 0.9 * len(ids), f"only {found}/{len(ids)} twins co-assigned"


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """LSH top-5 must overlap the exact top-5 by >= 2 on the fixed data
    (deterministic: hyperplanes and data are both fixed)."""
    exact = {r.vec_id for r in R.q24_ann_topk(spark, sf_dir).collect()}
    approx = {r.vec_id for r in R.x_ann_lsh_topk(spark, sf_dir).collect()}
    assert len(exact) == 5
    assert len(exact & approx) >= 2, f"LSH recall too low: {exact & approx}"


def test_mm_features_deterministic_stub(spark, sf_dir):
    """mapInPandas plumbing: schema + values of the deterministic fake
    decode, cross-checked in pure Python."""
    out = {r.doc_id: r for r in R.x_mm_features(spark, sf_dir).collect()}
    from mapr_plugins_spark.catalog import table

    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    assert set(out) == set(docs)
    for doc_id, text in list(docs.items())[:25]:
        b = text.encode("utf-8")
        r = out[doc_id]
        assert r.n_bytes == len(b)
        assert r.first_byte == b[0]
        assert abs(r.mean_byte - sum(b) / len(b)) < 1e-9


def test_asof_join_semantics(spark, sf_dir):
    """Hand-check as-of semantics on a tiny constructed frame."""
    from mapr_plugins_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")], "k INT, t INT, tag STRING"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 9, 900.0)], "k INT, t INT, v DOUBLE"
    )
    out = {
        r.tag: r.v_asof
        for r in asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()
    }
    assert out == {"L1": 100.0, "L2": 150.0, "L3": None}  # inclusive <=, none-before -> null


def test_spark_hex15_fast_path_equals_portable_form(spark):
    """The Spark-side conv() fast path must produce the identical value
    as the engine-portable 15-digit arithmetic used by the DuckDB
    oracles, for arbitrary md5 outputs."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.functions.portable_hash import (
        hex15_to_bigint_sql,
        spark_hex15_to_bigint_sql,
    )

    df = (
        spark.range(2000)
        .withColumn("hx", F.md5(F.col("id").cast("string")))
        .withColumn("slow", F.expr(hex15_to_bigint_sql("hx")))
        .withColumn("fast", F.expr(spark_hex15_to_bigint_sql("hx")))
    )
    assert df.filter(F.col("slow") != F.col("fast")).count() == 0


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """IVF invariants: probing ALL lists must reproduce the exact top-5
    bit-for-bit; partial probe keeps non-zero recall (the corpus is
    unclustered random noise — the worst case for IVF — so partial-probe
    recall is bounded loosely here; at sf0.01 the default recovers the
    full exact top-5)."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import ivf_topk, probe_of

    emb = table(spark, sf_dir, "embeddings")
    probe = probe_of(emb, probe_id=0)
    exact = [r.vec_id for r in R.q24_ann_topk(spark, sf_dir).collect()]
    full_probe = [
        r.vec_id for r in ivf_topk(emb, probe, k=5, n_lists=16, n_probe=16).collect()
    ]
    assert full_probe == exact, f"full-probe IVF must be exact: {full_probe} vs {exact}"
    # the graded key is the INDEX-BACKED exhaustive probe — also exact
    indexed = [r.vec_id for r in R.x_ann_ivf_topk(spark, sf_dir).collect()]
    assert indexed == exact, f"indexed exhaustive IVF must be exact: {indexed} vs {exact}"
    # partial probing (the approximate path) keeps nonzero overlap
    partial = {
        r.vec_id for r in ivf_topk(emb, probe, k=5, n_lists=16, n_probe=4).collect()
    }
    assert len(partial) == 5
    assert len(set(exact) & partial) >= 1, f"IVF recall collapsed: {set(exact) & partial}"


def test_hll_sketch_accuracy(spark, sf_dir):
    """DataSketches HLL estimates stay within 5% of exact distinct
    counts at lgK=12, and the merged (union) sketch estimates the global
    distinct count — the mergeability property that makes sketches the
    scale path."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.registry import x_sketch_hll

    rows = {r["event_type"]: r for r in x_sketch_hll(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events")
    for et, r in rows.items():
        if et == "__all__":
            exact = ev.select("user_id").distinct().count()
        else:
            exact = r["exact_users"]
        assert abs(r["approx_users"] - exact) <= max(1, 0.05 * exact), (et, r, exact)


def test_map_in_arrow_matches_map_in_pandas(spark, sf_dir):
    """extract_features_arrow (mapInArrow) and extract_features
    (mapInPandas) are the same operator at two Python batch interfaces —
    row sets must be identical."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        extract_features_arrow,
    )

    mm = attach_payload(table(spark, sf_dir, "documents"))
    a = {tuple(r) for r in extract_features(mm).collect()}
    b = {tuple(r) for r in extract_features_arrow(mm).collect()}
    assert a == b


def test_cms_overestimates_and_merges(spark, sf_dir):
    """CMS laws: est >= true count for every key, and the sketch of a
    union equals the cell-wise sum of the parts' sketches."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.sketch import cms_build, cms_estimate
    from mapr_plugins_spark.operators.text import tokens_col

    w, d = 64, 4
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens_col("text")).alias("token"))
        .persist()
    )
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(
            cms_build(toks, "token", w, d), toks, "token", w, d
        ).collect()
    }
    exact = {r["token"]: r["cnt"] for r in toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)

    half_a = toks.filter(F.col("doc_id") % 2 == 0)
    half_b = toks.filter(F.col("doc_id") % 2 == 1)
    merged = (
        cms_build(half_a, "token", w, d)
        .unionByName(cms_build(half_b, "token", w, d))
        .groupBy("seed", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(toks, "token", w, d)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}
    toks.unpersist()


def test_bloom_prefilter_superset_and_selectivity(spark, sf_dir):
    """The bloom bitset passes every true key (no false negatives) and
    drops most non-matching keys at the tested m/k."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.sketch import bloom_semi_join

    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = bloom_semi_join(li, urgent, on="l_orderkey", m_bits=1 << 16, k_hashes=3)
    want = li.join(urgent.distinct(), "l_orderkey", "left_semi")
    assert got.count() == want.count()

    # prefilter-only survivor count: rerun with an always-true residual
    # by probing the bitset directly on the distinct probe keys
    from mapr_plugins_spark.operators.sketch import bloom_bits
    bits = bloom_bits(urgent, "l_orderkey", 1 << 16, 3)
    n_set = sum(bin(b & (2**64 - 1)).count("1") for b in bits)
    assert n_set <= 3 * urgent.distinct().count()  # k bits per key max
    assert n_set / (1 << 16) < 0.5  # load factor sane for FPR


def test_ivf_batch_matches_brute_on_full_probe(spark, sf_dir):
    """Probing ALL lists makes batch IVF exact: per-probe results match
    the brute-force batch oracle bit-for-bit."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import (
        brute_force_topk_batch,
        ivf_topk_batch,
    )
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 101 == 0).orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    exact = {
        (r.probe_id, r.rank): r.vec_id
        for r in brute_force_topk_batch(emb, probes, k=3).collect()
    }
    full = {
        (r.probe_id, r.rank): r.vec_id
        for r in ivf_topk_batch(emb, probes, k=3, n_lists=8, n_probe=8).collect()
    }
    assert full == exact


def test_ann_guard_queries_execute(spark, sf_dir):
    """The self-verifying ANN queries run end-to-end (their in-plan
    recall guards hold on the shipped corpus)."""
    from mapr_plugins_spark.operators import registry as R

    rows = R.x_ann_ivf_batch(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.recall_at_5 <= 1.0 for r in rows)
    rows = R.x_ann_lsh_topk(spark, sf_dir).collect()
    assert rows and rows[0].recall_at_k >= 0.4


def test_ensure_staged_is_idempotent_and_atomic(tmp_path):
    """_ensure_staged must build exactly once (a missing root-level
    _SUCCESS caused silent per-execution KMeans re-fits — 2x bench
    cost) and a racing second build must lose cleanly."""
    import os

    from mapr_plugins_spark.operators.registry import _ensure_staged

    d = str(tmp_path / "idx")
    calls = []

    def build(p):
        calls.append(p)
        os.makedirs(os.path.join(p, "corpus"), exist_ok=True)

    _ensure_staged(d, build)
    _ensure_staged(d, build)
    assert len(calls) == 1, "restaged despite _SUCCESS"
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert os.path.exists(os.path.join(d, "corpus"))
    # no leftover temp siblings
    leftovers = [x for x in os.listdir(tmp_path) if x.startswith("idx.tmp-")]
    assert not leftovers, leftovers


def test_recall_guard_throws_on_violation(spark):
    """Negative proof the in-plan guard is NOT pruned by Catalyst: a
    violated floor must raise at collect time. (The old standalone
    `withColumn(assert_true).drop()` guard column was eliminated by
    column pruning and never evaluated — a failing guard collected
    cleanly.)"""
    import pytest
    from mapr_plugins_spark.operators.registry import _with_recall_guard

    approx = spark.createDataFrame([(1,), (2,)], "vec_id long")
    exact = spark.createDataFrame([(10,), (20,)], "vec_id long")  # recall 0
    bad = _with_recall_guard(approx, exact, k=2, floor=0.5)
    with pytest.raises(Exception, match="recall below floor"):
        bad.collect()
    # and a satisfied floor passes values through unchanged
    ok = _with_recall_guard(approx, exact, k=2, floor=0.0)
    assert [r.recall_at_k for r in ok.collect()] == [0.0, 0.0]


def test_hamming_ball_properties():
    """|ball(s, n, r)| = sum C(n, i) for i<=r; membership is symmetric
    (t in ball(s) iff s in ball(t)); radius 0 is the singleton."""
    from math import comb

    from mapr_plugins_spark.operators.similarity import hamming_ball

    for n_bits, radius in [(4, 0), (4, 1), (6, 1), (6, 2), (8, 2)]:
        ball = hamming_ball(0b1010 & ((1 << n_bits) - 1), n_bits, radius)
        assert len(ball) == sum(comb(n_bits, i) for i in range(radius + 1))
        assert len(set(ball)) == len(ball) == len(sorted(ball))
    s, t = 0b0110, 0b0100
    assert (t in hamming_ball(s, 6, 1)) and (s in hamming_ball(t, 6, 1))
    assert hamming_ball(s, 6, 0) == [s]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hamming_ball(0, 6, 3)


def test_histogram_quantile_accuracy_bound(spark, sf_dir):
    """Sketch estimates (left edge of the crossing bucket) sit within
    two bin widths of the exact percentile: the q-th order statistic is
    inside the crossing bucket (≤ 1 bin), and SQL percentile's linear
    interpolation can reach toward the next data point (≤ 1 more)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.sketch import histogram_quantile

    ev = table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    bin_w = (hi - lo) / 256.0
    est = {
        (r[0], r[1]): r[2]
        for r in histogram_quantile(ev, "event_type", "value").collect()
    }
    exact = {
        (r[0], q): r[i + 1]
        for r in ev.groupBy("event_type")
        .agg(*[F.expr(f"percentile(value, {q})") for q in (0.5, 0.9)])
        .collect()
        for i, q in enumerate((0.5, 0.9))
    }
    for k, e in est.items():
        assert abs(e - exact[k]) <= 2 * bin_w + 1e-9, (k, e, exact[k], bin_w)


def test_histogram_quantile_degenerate_range(spark):
    """All values equal (hi == lo): the bucket divide would be 0/0 —
    both the operator and the oracle short-circuit to bucket 0, and
    every quantile estimate is exactly that value."""
    from mapr_plugins_spark.operators.sketch import histogram_quantile

    df = spark.createDataFrame(
        [("a", 7.5), ("a", 7.5), ("b", 7.5)], "g string, v double"
    )
    rows = histogram_quantile(df, "g", "v").collect()
    assert len(rows) == 4  # 2 groups x 2 quantiles
    assert all(r.est == 7.5 for r in rows), rows


def test_histogram_quantile_cells_merge_law(spark, sf_dir):
    """Mergeability: building cells on two disjoint halves and summing
    counts per (group, bucket) equals building on the whole — the
    property that lets per-partition/per-day sketches fold without
    rescanning."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    w = (hi - lo) / 256.0
    bucket = F.least(F.lit(255), F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("int"))

    def cells(df):
        return {
            (r[0], r[1]): r[2]
            for r in df.withColumn("__b", bucket)
            .groupBy("event_type", "__b").count().collect()
        }

    whole = cells(ev)
    h1 = cells(ev.filter(F.col("event_id") % 2 == 0))
    h2 = cells(ev.filter(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for part in (h1, h2):
        for k, n in part.items():
            merged[k] = merged.get(k, 0) + n
    assert merged == whole


def test_substr_strip_complements_span_profile(spark, sf_dir):
    """strip and the span profile partition every document's tokens:
    kept_tokens + dup_tokens == n_tokens for all docs, and a doc with
    zero duplicated tokens keeps its text verbatim."""
    from mapr_plugins_spark.catalog import table

    prof = {r.doc_id: r for r in R.x_substr_dedup(spark, sf_dir).collect()}
    strip = {r.doc_id: r for r in R.x_substr_strip(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    assert set(prof) == set(strip) == set(docs)
    for doc_id, p in prof.items():
        s = strip[doc_id]
        assert p.n_tokens == s.n_tokens
        assert s.kept_tokens + p.dup_tokens == p.n_tokens, doc_id
        if p.dup_tokens == 0:
            assert s.clean_text == docs[doc_id], doc_id


def test_substr_dedup_full_coverage_on_exact_duplicate(spark):
    """A verbatim duplicated document is fully covered (dup_frac = 1.0)
    in BOTH copies, and an unrelated doc sharing no 8-token window
    stays at 0 — the sharp ends of the Lee et al. criterion."""
    from mapr_plugins_spark.operators.dedup import duplicated_ngram_spans

    text = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"z{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id LONG, text STRING"
    )
    out = {r.doc_id: r for r in duplicated_ngram_spans(docs, n=8).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[1].dup_tokens == 20
    assert out[3].dup_tokens == 0 and out[3].dup_frac == 0.0


def test_heavy_hitters_exact_at_high_cardinality(spark):
    """The MG candidate pass must not lose a true heavy hitter even
    when distinct cardinality >> counter budget k: 3 hot items inside
    a 20k-distinct tail, k=64, phi=1/50 — output must equal the exact
    group-by answer item-for-item."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.sketch import heavy_hitters

    hot = spark.range(3).selectExpr("concat('hot', id) AS item", "explode(sequence(1, 900)) AS rep")
    tail = spark.range(20000).selectExpr("concat('t', id) AS item", "1 AS rep")
    items = hot.select("item").unionByName(tail.select("item")).repartition(8)
    got = {
        (r.item, r.cnt): r.frac
        for r in heavy_hitters(items, "item", phi_inv=50, k=64).collect()
    }
    n = 3 * 900 + 20000
    exact = {("hot0", 900), ("hot1", 900), ("hot2", 900)}
    assert set(got) == exact, got
    for (_, cnt), frac in got.items():
        assert frac == cnt / n


def test_pq_seed_vectors_quantize_to_themselves(spark, sf_dir):
    """Codebook seeds are their own nearest centroid in every subspace
    (distance 0), so vec_id c < kc must encode as [c]*m — a sharp
    correctness law for the argmin and its tie-breaking."""
    rows = R.x_embed_pq_encode(spark, sf_dir).filter("vec_id < 16").collect()
    assert len(rows) == 16
    for r in rows:
        assert r.codes == ",".join([str(r.vec_id)] * 8), (r.vec_id, r.codes)


def test_pq_codes_shape(spark, sf_dir):
    """Every vector gets m=8 codes, each in [0, kc=16)."""
    rows = R.x_embed_pq_encode(spark, sf_dir).collect()
    for r in rows:
        cs = [int(c) for c in r.codes.split(",")]
        assert len(cs) == 8 and all(0 <= c < 16 for c in cs), r


def test_scd2_interval_laws(spark, sf_dir):
    """Per key: versions are consecutive from 1, exactly one open
    (current) interval, and each interval's end is the next interval's
    start — the partition-of-timeline property SCD2 promises."""
    from collections import defaultdict

    rows = R.x_scd2_build(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1)), user
        assert sum(r.is_current for r in rs) == 1 and rs[-1].is_current, user
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us, user
        # change compaction: consecutive intervals carry different states
        assert all(a.event_type != b.event_type for a, b in zip(rs, rs[1:])), user


def test_group_split_is_leakage_safe(spark, sf_dir):
    """All documents of one source land on one side — the property that
    keeps intra-source near-duplicates from straddling train/test."""
    rows = R.x_group_split(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in per_source.values())
    splits = {next(iter(s)) for s in per_source.values()}
    assert splits == {"train", "test"}  # both sides actually populated


def test_nfc_normalize_idempotent(spark, sf_dir):
    """NFC(NFC(x)) == NFC(x), and composition strictly shortened every
    augmented doc (a+U+0301 pairs collapsed to single codepoints)."""
    from mapr_plugins_spark.operators.text import nfc_normalize
    from pyspark.sql import functions as F

    out = R.x_text_nfc_normalize(spark, sf_dir)
    again = nfc_normalize(out, text_col="norm_text", out_col="norm2")
    assert again.filter(F.col("norm2") != F.col("norm_text")).count() == 0
    assert out.filter(~F.col("changed")).count() == 0


def test_bpe_merges_actually_fire(spark, sf_dir):
    """BPE must compress: post-merge token count strictly below the
    character count for every doc, and a word the merge chain fully
    composes ("spark": s p→sp, a r→ar, sp ar k→spark) must come out as
    ONE token whenever it leads a document."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table

    out = R.x_bpe_encode(spark, sf_dir)
    chars = table(spark, sf_dir, "documents").select(
        "doc_id", (F.length(F.replace("text", F.lit(" "), F.lit(""))).alias("n_chars"))
    )
    j = out.join(chars, "doc_id")
    assert j.filter(F.col("n_bpe_tokens") >= F.col("n_chars")).count() == 0
    sp = j.filter(F.col("first_word_bpe").startswith("spark"))
    lead = [r.first_word_bpe for r in sp.collect()]
    assert all(w == "spark" for w in lead), set(lead)
    assert out.filter(F.col("n_bpe_tokens") < F.col("n_words")).count() == 0


def test_ivfpq_results_come_from_probed_lists(spark, sf_dir):
    """Every IVF-PQ hit must live in one of the probe's n_probe coarse
    lists (the pruning contract), and the probe's own list (it is coarse
    seed 0 → distance 0 to centroid 0) must be probed."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import ivfpq_parts

    emb = table(spark, sf_dir, "embeddings")
    _, _, assigned = ivfpq_parts(emb, n_lists=8, m=8, kc=16)
    lists = {r.vec_id: r.list_id for r in assigned.collect()}
    hits = [r.vec_id for r in R.x_ann_ivfpq_topk(spark, sf_dir).collect()]
    assert len(hits) == 10
    probed = {lists[v] for v in hits}
    assert len(probed) <= 4, probed
    assert lists[0] in probed  # the probe's own list is always scanned


def test_winsorize_clip_laws(spark, sf_dir):
    """Clipped fraction stays ~2% (P1/P99 cut, ± rank-rounding per
    group), every output value lies inside its group's [lo, hi], and
    unclipped rows pass through bit-identical."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table

    out = R.x_winsorize(spark, sf_dir)
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    j = out.join(ev, "event_id")
    n = j.count()
    n_clip = j.filter("clipped").count()
    assert n_clip <= 0.03 * n, (n_clip, n)
    assert j.filter(F.col("clipped") & (F.col("value_w") == F.col("value"))).count() == 0
    assert j.filter(~F.col("clipped") & (F.col("value_w") != F.col("value"))).count() == 0
    spans = j.groupBy("event_type").agg(
        F.min("value_w").alias("mn"), F.max("value_w").alias("mx"),
        F.min("value").alias("rmn"), F.max("value").alias("rmx"),
    )
    assert spans.filter((F.col("mn") < F.col("rmn")) | (F.col("mx") > F.col("rmx"))).count() == 0


def test_png_header_parser_on_real_bytes(spark):
    """The parser must decode a genuine PNG header (bytes built by an
    independent Python encoder, not the in-plan builder) and must
    classify a corrupted signature as opaque bytes."""
    import struct

    from mapr_plugins_spark.operators.multimodal import parse_png_header

    def png(width, height):
        ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(
            ">IIBBBBB", width, height, 8, 2, 0, 0, 0
        ) + b"\x00\x00\x00\x00"
        return b"\x89PNG\r\n\x1a\n" + ihdr

    rows = [(1, png(640, 480)), (2, png(7, 70000)), (3, b"\x00" + png(9, 9)[1:])]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    out = {r.doc_id: r for r in parse_png_header(df).collect()}
    assert (out[1].mime, out[1].width, out[1].height) == ("image/png", 640, 480)
    assert (out[2].width, out[2].height) == (7, 70000)  # >16-bit dims decode
    assert out[3].mime == "application/octet-stream"
    assert out[1].bit_depth == 8 and out[1].color_type == 2


def test_pq_rerank_recall_dominates_raw_adc(spark, sf_dir):
    """Re-ranked results: cosines are exact (agree with the brute-force
    oracle values for those ids), and recall@10 vs exact top-10 is at
    least as good as raw ADC's (the re-rank can only fix ordering
    inside the candidate set, never worsen it)."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import brute_force_topk, probe_of

    emb = table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in brute_force_topk(emb, probe_of(emb, 0), k=10).collect()]
    rer = [r.vec_id for r in R.x_ann_pq_rerank(spark, sf_dir).collect()]
    adc = [r.vec_id for r in R.x_ann_pq_topk(spark, sf_dir).collect()]
    assert len(set(rer) & set(exact)) >= len(set(adc) & set(exact))
    assert len(rer) == 10


def test_gopher_rules_verdict_consistency(spark, sf_dir):
    """Both verdicts occur on the corpus; fail_reason is NULL exactly
    on passing docs and names the FIRST violated rule otherwise; the
    reported features support the verdict they claim."""
    rows = R.x_gopher_rules(spark, sf_dir).collect()
    assert any(r.passes for r in rows) and any(not r.passes for r in rows)
    for r in rows:
        assert (r.fail_reason is None) == r.passes
        if r.fail_reason == "word_count":
            assert not (30 <= r.n_words <= 100000)
        elif r.fail_reason == "stopword_hits":
            assert 30 <= r.n_words <= 100000 and r.stop_hits < 2
        elif r.passes:
            assert r.stop_hits >= 2 and 30 <= r.n_words <= 100000


def test_drift_chi2_statistic_laws(spark, sf_dir):
    """Structural laws of the χ² report: non-negative contributions,
    expected counts summing to the current-wave total (the ref→cur
    scaling contract), populated sides — and an INJECTED drift (current
    wave shifted +30) must raise the statistic far above the unshifted
    baseline, proving the statistic actually responds to shift."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.analytics import drift_chi2

    rows = R.x_drift_chi2(spark, sf_dir).collect()
    stat = sum(r.chi2_contrib6 for r in rows if r.chi2_contrib6 is not None)
    assert stat >= 0
    assert all(r.chi2_contrib6 is None or r.chi2_contrib6 >= 0 for r in rows)
    t_cur = sum(r.n_cur for r in rows)
    exp_sum = sum(r.expected6 for r in rows if r.expected6 is not None)
    assert abs(exp_sum - t_cur) < 0.01 * t_cur
    assert sum(r.n_ref for r in rows) > 0 and t_cur > 0

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    shifted = ev.withColumn(
        "value",
        F.when(F.col("event_type") == "purchase", F.col("value") + 30).otherwise(
            F.col("value")
        ),
    )
    drifted = drift_chi2(
        shifted, F.col("event_type") == "click", "value", n_bins=10, lo=0.0, hi=100.0
    ).collect()
    dstat = sum(r.chi2_contrib6 for r in drifted if r.chi2_contrib6 is not None)
    assert dstat > 10 * max(stat, 1.0), (stat, dstat)


def test_token_budget_fill_laws(spark, sf_dir):
    """Kept rows per source form a PREFIX of the ingestion order (no
    cherry-picking beyond the cut), each source's kept tokens respect
    the budget, and the first doc of every source is kept when it fits."""
    from collections import defaultdict

    rows = R.x_token_budget_fill(spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        kept = [r.kept for r in rs]
        assert kept == sorted(kept, reverse=True), src  # prefix property
        tot = sum(r.n_tokens for r in rs if r.kept)
        assert tot <= 2000, (src, tot)
        if rs and rs[0].n_tokens <= 2000:
            assert rs[0].kept, src


def test_matryoshka_full_dim_is_identity(spark, sf_dir):
    """At the full dimension the prefix IS the embedding: overlap must
    be exactly k and top-1 must equal the exact top-1; truncated dims
    report values in [0, k]."""
    rows = {r.dim: r for r in R.x_matryoshka_eval(spark, sf_dir).collect()}
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import brute_force_topk, probe_of

    emb = table(spark, sf_dir, "embeddings")
    exact = [r.vec_id for r in brute_force_topk(emb, probe_of(emb, 0), k=10).collect()]
    assert rows[64].overlap_at_k == 10 and rows[64].top1_id == exact[0]
    for d in (16, 32):
        assert 0 <= rows[d].overlap_at_k <= 10


def test_wav_header_parser_on_real_bytes(spark):
    """The parser must decode a genuine WAV header written by Python's
    stdlib `wave` module (fully independent encoder) and classify a
    corrupted RIFF signature as opaque bytes."""
    import io
    import wave

    from mapr_plugins_spark.operators.multimodal import parse_wav_header

    def wav(channels, rate, width):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setframerate(rate)
            w.setsampwidth(width)
            w.writeframes(b"\x00" * width * channels)
        return buf.getvalue()

    rows = [(1, wav(2, 48000, 2)), (2, wav(1, 8000, 2)), (3, b"X" + wav(1, 8000, 2)[1:])]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    out = {r.doc_id: r for r in parse_wav_header(df).collect()}
    assert (out[1].mime, out[1].channels, out[1].sample_rate, out[1].bits_per_sample) == (
        "audio/wav", 2, 48000, 16,
    )
    assert out[1].byte_rate == 48000 * 2 * 2
    assert (out[2].channels, out[2].sample_rate) == (1, 8000)
    assert out[3].mime == "application/octet-stream"


def test_epoch_shuffle_permutes_balances_and_reshuffles(spark, sf_dir):
    """epoch_pos must be a dense permutation of 0..N-1, round-robin
    shards must be balanced within one row, and a different epoch must
    induce a different order (the reshuffle property a data loader
    relies on)."""
    from mapr_plugins_spark.operators.sampling import epoch_shuffle

    from mapr_plugins_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id")
    e1 = epoch_shuffle(docs, "CAST(doc_id AS STRING)", n_shards=8, seed=23, epoch=1)
    rows = e1.collect()
    n = len(rows)
    assert sorted(r.epoch_pos for r in rows) == list(range(n))
    by_shard = {}
    for r in rows:
        assert r.shard == r.epoch_pos % 8
        assert r.within_shard_pos == r.epoch_pos // 8
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert max(by_shard.values()) - min(by_shard.values()) <= 1
    e0 = {
        r.doc_id: r.epoch_pos
        for r in epoch_shuffle(
            docs, "CAST(doc_id AS STRING)", n_shards=8, seed=23, epoch=0
        ).collect()
    }
    moved = sum(1 for r in rows if e0[r.doc_id] != r.epoch_pos)
    assert moved > 0.9 * n, f"epoch 1 left {n - moved}/{n} rows in place"


def test_dsir_ratio_micro_far_from_rounding_boundary(sf_dir):
    """x_dsir_select's only float step is 64 bucket ln() calls rounded
    to integer micro-units. Pin every pre-round value at this sf FAR
    from its .5 boundary (>1e-3 micro-units), so a last-ulp JVM-vs-libm
    ln() difference can never flip a rounded micro-unit — the exactness
    claim of the integer weight sum rests on this."""
    import duckdb

    from mapr_plugins_spark.functions.portable_hash import seeded_hash60_sql
    from mapr_plugins_spark.operators.registry import _TOKS_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    dists = con.execute(f"""
        WITH t AS (
            SELECT doc_id, (source = 'src0') AS is_tgt, {_TOKS_SQL} AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, is_tgt,
                   CASE WHEN len(toks) >= 2
                        THEN list_transform(range(1, len(toks)),
                                            i -> toks[i] || '_' || toks[i + 1])
                        ELSE [] END AS bgs
            FROM t
        ),
        e AS (SELECT doc_id, is_tgt, unnest(bgs) AS bg FROM g),
        b AS (SELECT is_tgt, {seeded_hash60_sql("bg", "29")} % 64 AS bucket FROM e),
        dist AS (
            SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS raw_n,
                   CAST(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n
            FROM b GROUP BY bucket
        ),
        fulld AS (
            SELECT rb.bucket, coalesce(raw_n, 0) AS raw_n, coalesce(tgt_n, 0) AS tgt_n
            FROM (SELECT unnest(range(0, 64)) AS bucket) rb LEFT JOIN dist USING (bucket)
        ),
        tot AS (
            SELECT CAST(SUM(raw_n) AS BIGINT) AS raw_tot,
                   CAST(SUM(tgt_n) AS BIGINT) AS tgt_tot
            FROM fulld
        )
        SELECT bucket,
               (ln((tgt_n + 1.0) / (tgt_tot + 64.0))
                - ln((raw_n + 1.0) / (raw_tot + 64.0))) * 1000000 AS micro
        FROM fulld, tot
    """).fetchall()
    assert len(dists) == 64
    for bucket, micro in dists:
        frac = abs(micro - int(micro // 1) - 0.5)  # distance to the .5 boundary
        assert frac > 1e-3, f"bucket {bucket}: {micro} too close to a .5 boundary"


def test_bpe_train_learned_table_compresses_via_encoder(spark, sf_dir):
    """The trained merge table must be well-formed (ranks 1..8, positive
    weighted counts) and EFFECTIVE: applying it through bpe_encode must
    strictly reduce corpus token count below the unmerged character
    count — train and apply compose."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.registry import x_bpe_train
    from mapr_plugins_spark.operators.text import bpe_encode

    rows = sorted(x_bpe_train(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, 9))
    assert all(r.pair_count >= 1 for r in rows)
    merges = tuple(
        (f"{r.merge_left} {r.merge_right} ", f"{r.merge_left}{r.merge_right} ")
        for r in rows
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tokens = bpe_encode(docs, merges=merges).agg(
        F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]["t"]
    n_chars = docs.select(
        F.sum(F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias("c")
    ).collect()[0]["c"]
    assert n_tokens < n_chars, (n_tokens, n_chars)


def test_seeded_hash60_col_equals_sql_form(spark):
    """The Column-composed hash helper (used inside HOF lambdas) must
    produce the identical value as the shared-SQL-text form."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.functions.portable_hash import (
        seeded_hash60,
        seeded_hash60_col,
    )

    df = spark.createDataFrame([("alpha",), ("beta gamma",), ("",)], "v STRING")
    out = df.select(
        seeded_hash60_col(F.col("v"), "29").alias("a"),
        seeded_hash60("v", "29").alias("b"),
    ).collect()
    assert all(r.a == r.b for r in out), out


def test_sniff_mime_short_payloads_decided_explicitly(spark):
    """Payloads shorter than the 4-byte heuristic window must be
    classified deliberately, not fall through because conv(hex(''))
    goes NULL: short printable → text/plain, empty → opaque, short
    non-printable → opaque."""
    from mapr_plugins_spark.operators.multimodal import sniff_mime

    df = spark.createDataFrame(
        [
            (1, b""),  # empty → opaque by rule
            (2, b"a"),  # 1 printable byte
            (3, b"ok!"),  # 3 printable bytes
            (4, b"\x01\x02"),  # short, non-printable
            (5, b"text that is long enough"),
            (6, b"\x00binary"),
        ],
        "doc_id INT, payload BINARY",
    )
    got = {r.doc_id: r.mime for r in sniff_mime(df).collect()}
    assert got == {
        1: "application/octet-stream",
        2: "text/plain",
        3: "text/plain",
        4: "application/octet-stream",
        5: "text/plain",
        6: "application/octet-stream",
    }, got


def test_winsorize_ranks_nulls_last(spark):
    """A NULL value must sort AFTER every real value in the rank window
    (DuckDB convention), so the P1 bound over 100 reals + 2 nulls is
    the rank-2 real value — under Spark's default NULLS FIRST the
    nulls would occupy ranks 1-2 and shift every bound."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.analytics import winsorize

    rows = [("g", float(i), i) for i in range(1, 101)]
    rows += [("g", None, 101), ("g", None, 102)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE, id INT")
    out = winsorize(df, "k", "v", "id")
    got = {r.id: (r.v_w, r.clipped) for r in out.collect()}
    # n=102 → lo rank = (1*102+99)//100 = 2 → lo = 2.0 (nulls last);
    # value 1.0 clips up to 2.0, value 100.0 passes through (the P99
    # rank lands on a null → no upper clip, verdict still False, not
    # NULL), and null values stay null unclipped.
    assert got[1] == (2.0, True), got[1]
    assert got[100] == (100.0, False), got[100]
    assert got[101] == (None, False), got[101]
    assert got[102] == (None, False), got[102]


def test_bpe_train_collected_equals_distributed(spark, sf_dir):
    """The driver-side production trainer must reproduce the
    distributed trainer's merge table ROUND FOR ROUND (same pairs,
    same counts, same order) at a merge count past the graded 8."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.text import bpe_train, bpe_train_collected

    docs = table(spark, sf_dir, "documents").select("text")
    a = [tuple(r) for r in bpe_train(docs, n_merges=16).collect()]
    b = [tuple(r) for r in bpe_train_collected(docs, n_merges=16).collect()]
    assert len(a) == 16 and a == b, (a[:3], b[:3])


def test_bpe_train_collected_vocab_cap_is_loud(spark, sf_dir):
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.text import bpe_train_collected

    docs = table(spark, sf_dir, "documents").select("text")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_collected(docs, n_merges=1, max_vocab_rows=3)


def test_wav_pcm_decoder_on_independent_bytes(spark):
    """The PCM decoder must reconstruct the exact samples of a genuine
    WAV file built by Python's own wave module (an independent encoder,
    not the in-plan builder)."""
    import io
    import struct
    import wave

    from mapr_plugins_spark.operators.multimodal import decode_wav_pcm

    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 100]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    df = spark.createDataFrame([(1, buf.getvalue())], "doc_id INT, payload BINARY")
    r = decode_wav_pcm(df).collect()[0]
    assert r.n_samples == len(samples)
    assert r.sum_pcm == sum(samples)
    assert r.min_pcm == min(samples) and r.max_pcm == max(samples)
    assert r.sumsq_pcm == sum(x * x for x in samples)

    # corrupted signature → empty decode, not garbage
    bad = spark.createDataFrame(
        [(2, b"RIFX" + buf.getvalue()[4:])], "doc_id INT, payload BINARY"
    )
    rb = decode_wav_pcm(bad).collect()[0]
    assert rb.n_samples == 0 and rb.sum_pcm == 0


def test_lr_quality_score_laws(spark, sf_dir):
    """Classifier inference laws: every feature in [0, 1e6] (f_cap ≤
    1e6 by the saturating cap), score = the fixed weight combination,
    BOTH verdicts occur on the corpus, and keep ⟺ score > threshold."""
    from pyspark.sql import functions as F

    out = R.x_quality_lr_score(spark, sf_dir)
    bad = out.filter(
        (F.col("f_cap") < 0) | (F.col("f_cap") > 1_000_000)
        | (F.col("f_stop") < 0) | (F.col("f_stop") > 1_000_000)
        | (F.col("f_ttr") < 0) | (F.col("f_ttr") > 1_000_000)
        | (F.col("f_wlen") < 0) | (F.col("f_wlen") > 1_000_000)
    )
    assert bad.count() == 0
    recomputed = out.filter(
        F.col("score_micro")
        != 3 * F.col("f_cap") + 2 * F.col("f_stop") + 3 * F.col("f_ttr") + 2 * F.col("f_wlen")
    )
    assert recomputed.count() == 0
    verdicts = {r.keep for r in out.select("keep").distinct().collect()}
    assert verdicts == {True, False}, verdicts
    assert out.filter(F.col("keep") != (F.col("score_micro") > 4_300_000)).count() == 0


def test_mad_outliers_laws(spark, sf_dir):
    """Hampel-rule laws: dev6 = |value − group median| (checked via a
    zero-dev row per group — the median element itself), outliers are
    a minority in every group, and both verdicts occur."""
    from pyspark.sql import functions as F

    out = R.x_mad_outliers(spark, sf_dir)
    per = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("int")).alias("n_out"),
        F.min("dev6").alias("min_dev"),
    )
    rows = per.collect()
    assert rows
    for r in rows:
        assert r.min_dev == 0.0, r  # the median element has zero deviation
        assert 0 < r.n_out < 0.5 * r.n, r  # robust rule flags a minority


def test_k_anonymity_laws(spark, sf_dir):
    """Class sizes sum to the table size, the verdict is exactly the
    k cut, and both verdicts occur at this scale."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table

    out = R.x_k_anonymity(spark, sf_dir)
    n = table(spark, sf_dir, "customer").count()
    assert out.agg(F.sum("class_size")).collect()[0][0] == n
    assert out.filter(F.col("is_anonymous") != (F.col("class_size") >= 10)).count() == 0
    # both verdicts occur whenever any class reaches k (true at the
    # graded sf0.01: ~125 classes, mean size ~12; sf0.001 is all-small)
    mx = out.agg(F.max("class_size")).collect()[0][0]
    if mx >= 10:
        verdicts = {
            r.is_anonymous for r in out.select("is_anonymous").distinct().collect()
        }
        assert verdicts == {True, False}, verdicts


def test_cms_merge_per_source_equals_global(spark, sf_dir):
    """Cell-wise merge of per-source sketches must equal the single
    global sketch EXACTLY (cells are counts; merge is associative)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.sketch import (
        cms_build,
        cms_build_per_part,
        cms_merge,
    )
    from mapr_plugins_spark.operators.text import tokens_col

    toks = table(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_col("text")).alias("token")
    )
    merged = {
        (r.seed, r.pos): r.cnt
        for r in cms_merge(cms_build_per_part(toks, "token", "source", 64, 4)).collect()
    }
    whole = {
        (r.seed, r.pos): r.cnt
        for r in cms_build(toks.select("token"), "token", 64, 4).collect()
    }
    assert merged == whole


def test_triangle_count_on_known_graphs(spark):
    """K4: every node sits in C(3,2) = 3 triangles; adding a pendant
    node changes nothing; a square (4-cycle) has none."""
    from mapr_plugins_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "a INT, b INT")
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}, got

    square = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "a INT, b INT")
    assert triangle_count(square).count() == 0


def test_scd2_lookup_point_in_time_semantics(spark):
    """A fact must see exactly the dimension version valid AT its own
    timestamp — never an earlier or later one — and facts before the
    first version attach nothing."""
    import datetime as dt

    from mapr_plugins_spark.operators.merge import scd2_build, scd2_lookup

    def t(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    log = spark.createDataFrame(
        [(1, "A", t(10), 1), (1, "B", t(20), 2), (1, "B", t(25), 3), (1, "C", t(30), 4)],
        "k INT, attr STRING, ts TIMESTAMP_NTZ, id INT",
    )
    dim = scd2_build(log, "k", "attr", "ts", "id").select(
        "k", "valid_from_us", "valid_to_us", F.col("attr").alias("state"), "version"
    )
    from pyspark.sql import functions as F2

    facts = spark.createDataFrame(
        [(100, 1, t(5)), (101, 1, t(10)), (102, 1, t(22)), (103, 1, t(30)), (104, 1, t(99))],
        "fid INT, k INT, fts TIMESTAMP_NTZ",
    ).select("fid", "k", F2.unix_micros(F2.col("fts").cast("timestamp")).alias("fact_us"))
    got = {
        r.fid: (r.state, r.version)
        for r in scd2_lookup(facts, dim, "k", "fact_us", ["state", "version"]).collect()
    }
    assert got == {
        100: (None, None),  # before the first version
        101: ("A", 1),      # inclusive at valid_from
        102: ("B", 2),      # mid-interval (the t25 duplicate never made a version)
        103: ("C", 3),      # boundary belongs to the NEW version
        104: ("C", 3),      # open current interval
    }, got


from pyspark.sql import functions as F  # noqa: E402


def test_dq_expectations_detects_injected_violations(spark):
    """Each rule kind must fire on a constructed frame with known
    defects and stay quiet on the clean part."""
    from mapr_plugins_spark.operators.expectations import dq_expectations

    df = spark.createDataFrame(
        [(1, "O", 10), (2, "O", 10), (2, "F", None), (3, "X", 99)],
        "id INT, status STRING, fk INT",
    )
    ref = spark.createDataFrame([(10,)], "k INT")
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in dq_expectations(
            df,
            not_null=("fk",),
            unique=("id",),
            accepted_values={"status": ("O", "F")},
            references={"fk": (ref, "k")},
        ).collect()
    }
    assert out == {
        "not_null:fk": (1, False),
        "unique:id": (1, False),
        "accepted_values:status": (1, False),
        "references:fk": (1, False),
    }, out


# ---------------------------------------------------------------------------
# round 5: production-merge-count BPE encode + DOULION triangle estimate


def _synthetic_merges(n: int) -> tuple[tuple[str, str], ...]:
    """Deterministic synthetic merge table of arbitrary size: all
    letter digrams first (these actually fire on the corpus), then
    digram+letter trigram patterns to reach production table sizes."""
    import itertools
    import string

    letters = string.ascii_lowercase
    out: list[tuple[str, str]] = []
    for a, b in itertools.product(letters, letters):
        out.append((f"{a} {b} ", f"{a}{b} "))
        if len(out) >= n:
            return tuple(out)
    for a, b, c in itertools.product(letters, letters, letters):
        out.append((f"{a}{b} {c} ", f"{a}{b}{c} "))
        if len(out) >= n:
            return tuple(out)
    return tuple(out)


def test_bpe_encode_fast_equals_chain_shipped_table(spark, sf_dir):
    """The Arrow-vectorized encoder must be row-for-row identical to
    the codegen replace chain at the shipped merge table (the same
    equality pattern that pins bpe_train_collected to bpe_train)."""
    a = R.x_bpe_encode(spark, sf_dir).orderBy("doc_id").collect()
    b = R.x_bpe_encode_fast(spark, sf_dir).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_encode_fast_equals_chain_at_256_merges(spark, sf_dir):
    """Cross-implementation equality an order of magnitude beyond the
    shipped table: 256 digram merges (all of which CAN fire on real
    text), chain vs pandas-UDF scan, on a corpus slice."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.text import bpe_encode, bpe_encode_fast

    merges = _synthetic_merges(256)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    a = bpe_encode(docs, merges=merges).orderBy("doc_id").collect()
    b = bpe_encode_fast(docs, merges=merges).orderBy("doc_id").collect()
    assert len(a) > 0
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_encode_fast_handles_30k_merges(spark, sf_dir):
    """The production claim itself: a 30 000-merge table runs through
    the pandas-UDF encoder with an O(1)-size plan (the chain encoder
    would build a 30k-deep Catalyst expression tree here — SCALE.md's
    plan-size trap). Digram prefix ⇒ the output must also stay
    consistent with the 676-digram table wherever trigram patterns
    never fire (trigram patterns require the space-free digram symbol
    produced by the digram prefix, so they only compose further)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.text import bpe_encode_fast

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    big = bpe_encode_fast(docs, merges=_synthetic_merges(30_000)).orderBy("doc_id")
    rows = big.collect()
    assert len(rows) == docs.count() > 0
    chars = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.length(F.replace("text", F.lit(" "), F.lit(""))).alias("n"),
        ).collect()
    }
    for r in rows:
        assert 0 < r.n_bpe_tokens < chars[r.doc_id]
    # trigram merges only ever shrink token counts further
    small = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_encode_fast(docs, merges=_synthetic_merges(676)).collect()
    }
    for r in rows:
        assert r.n_bpe_tokens <= small[r.doc_id]


def test_sparsify_edges_deterministic_across_partitionings(spark, sf_dir):
    """The DOULION coin is a pure function of the edge — the kept
    subset must be identical under any physical partitioning, and a
    strict, non-empty subset at p=1/2."""
    from mapr_plugins_spark.operators.graph import sparsify_edges

    edges = R._copurchase_edges(spark, sf_dir)
    a = sorted(map(tuple, sparsify_edges(edges.repartition(3)).collect()))
    b = sorted(map(tuple, sparsify_edges(edges.repartition(11)).collect()))
    assert a == b
    assert 0 < len(a) < edges.count()


def test_triangle_estimate_is_exactly_scaled_sparse_count(spark, sf_dir):
    """est = 8 × (exact triangle count of the sparsified graph) — the
    estimator composes the EXACT counter, so its only new moving part
    is the deterministic coin and the integer scale-up."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.graph import (
        sparsify_edges,
        triangle_count,
        triangle_global_estimate,
    )

    edges = R._copurchase_edges(spark, sf_dir)
    t_sparse = (
        triangle_count(sparsify_edges(edges))
        .agg(F.expr("CAST(coalesce(sum(n_triangles), 0) DIV 3 AS BIGINT)").alias("t"))
        .collect()[0][0]
    )
    est = triangle_global_estimate(edges).collect()[0][0]
    assert est == 8 * t_sparse


def test_triangle_estimate_guard_throws_on_violation(spark, sf_dir):
    """The accuracy guard is a retained column Catalyst cannot prune:
    with an impossible bound (-1 micro) the query itself must fail."""
    with pytest.raises(Exception, match="DOULION estimate error"):
        R.x_triangle_estimate(spark, sf_dir, max_rel_err_micro=-1).collect()


def test_temperature_mix_laws(spark, sf_dir):
    """α=1/2 temperature law: the smallest source is kept whole, rates
    are monotonically decreasing in source size, kept counts track
    sqrt(n_s·n_min) within binomial noise, and no source's un-floored
    micro-rate sits dangerously close to an integer boundary (the
    cross-engine floor-rounding hazard, DSIR-style pin)."""
    import math

    out = R.x_temperature_mix(spark, sf_dir)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, [r.n_source, r.rate_micro, 0])
        per[r.source][2] += 1
    nmin = min(n for n, _, _ in per.values())
    for src, (n, rate, kept) in per.items():
        exact = 1e6 * math.sqrt(nmin / n)
        assert abs(exact - round(exact)) > 1e-3 or rate == round(exact), (src, exact)
        assert rate == math.floor(exact)
        if n == nmin:
            assert kept == n  # rate_micro = 1e6 → smallest source whole
        expect = n * rate / 1e6
        tol = 4 * math.sqrt(max(expect, 1))
        assert abs(kept - expect) <= tol, (src, kept, expect)
    rates = sorted(((n, r) for n, r, _ in per.values()))
    assert all(
        ra >= rb for (_, ra), (_, rb) in zip(rates, rates[1:])
    ), "rates must fall as sources grow"


def test_containment_finds_injected_and_dominates_jaccard(spark, sf_dir):
    """Every injected drop-first-word variant must pair with its source
    at containment ≥ 0.8 (true doc-in-doc recall is exact for the
    bottom-k sketch), and containment ≥ Jaccard on any shared pair —
    the asymmetric-inclusion law."""
    out = R.x_dedup_containment(spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.containment for r in out}
    n_docs = R.x_text_tokens(spark, sf_dir).count()
    found = sum((i, i + 1000000) in pairs for i in range(n_docs))
    assert found >= 0.9 * n_docs, f"only {found}/{n_docs} injected variants found"
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in R.x_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    shared = set(pairs) & set(jac)
    assert shared and all(pairs[p] >= jac[p] - 1e-9 for p in shared)


def test_containment_exact_for_true_substring(spark):
    """A document that IS a substring of another must score exactly
    1.0 — every one of its 8-grams occurs in the container."""
    from mapr_plugins_spark.operators.dedup import ngram_containment_pairs

    long_text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, long_text), (2, long_text[10:40]), (3, "completely unrelated words")],
        "doc_id BIGINT, text STRING",
    )
    rows = ngram_containment_pairs(docs, n=8, bottom_k=3, threshold=0.8).collect()
    assert {(r.id_a, r.id_b): r.containment for r in rows} == {(1, 2): 1.0}


def test_ccnet_buckets_laws(spark, sf_dir):
    """Tercile law: within every source the three buckets differ by at
    most one row, 'keep' is exactly head+middle, and every head doc
    outscores every tail doc of the same source."""
    rows = R.x_ccnet_buckets(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        sizes = [sum(1 for r in rs if r.bucket == b) for b in (0, 1, 2)]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        assert all(r.keep == (r.bucket <= 1) for r in rs)
        heads = [r.lm_score for r in rs if r.bucket == 0]
        tails = [r.lm_score for r in rs if r.bucket == 2]
        if heads and tails:
            assert min(heads) >= max(tails)


def test_k_core_known_graph_and_guard(spark):
    """K5 clique + a pendant chain: the 3-core is exactly the clique
    with in-core degree 4; an under-budgeted round count must raise
    through the convergence guard instead of returning a supercore."""
    from mapr_plugins_spark.operators.graph import k_core

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "a BIGINT, b BIGINT")
    out = {r.node: r.core_degree for r in k_core(edges, k=3, rounds=6).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # chain needs 3 peels (12 → 11 → 10); rounds=1 must NOT converge
    with pytest.raises(Exception, match="did not converge"):
        k_core(edges, k=2, rounds=1).collect()
    # with budget, the 2-core keeps the clique only (chain fully peels)
    out2 = {r.node: r.core_degree for r in k_core(edges, k=2, rounds=6).collect()}
    assert set(out2) == {0, 1, 2, 3, 4}


def test_k_core_empty_core_and_cap_certify(spark):
    """Internals pin for the round-13 final-pass reuse: an empty k-core
    exits on the in-loop checkpointed degree table (schema intact, zero
    rows), and a peel whose round budget runs out right after the
    converging peel is certified by the single post-loop degree pass —
    returned, not raised."""
    from mapr_plugins_spark.operators.graph import k_core

    chain = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "a BIGINT, b BIGINT")
    out = k_core(chain, k=2, rounds=6)
    assert out.columns == ["node", "core_degree"]
    assert out.count() == 0
    # K4 + pendant at k=3, rounds=1: round 1 peels the pendant and
    # exhausts the cap; the certify pass sees the unchanged 3-core
    # (n_final == prev_n) and must return it
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)] + [(3, 9)]
    e2 = spark.createDataFrame(k4, "a BIGINT, b BIGINT")
    out2 = {r.node: r.core_degree for r in k_core(e2, k=3, rounds=1).collect()}
    assert out2 == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcenter_separation_curve_and_determinism(spark, sf_dir):
    """Gonzalez laws: 8 distinct centers, seed is the lowest vec_id
    with sep 0, the separation curve is monotone non-increasing from
    rank 1 on, and the trajectory is identical under a different
    input partitioning."""
    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import kcenter_select

    rows = sorted(
        R.x_kcenter_select(spark, sf_dir).collect(), key=lambda r: r.center_rank
    )
    assert len({r.vec_id for r in rows}) == 8
    min_id = table(spark, sf_dir, "embeddings").agg({"vec_id": "min"}).collect()[0][0]
    assert rows[0].vec_id == min_id and rows[0].sep_d2 == 0.0
    seps = [r.sep_d2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(seps, seps[1:])), seps
    again = sorted(
        kcenter_select(
            table(spark, sf_dir, "embeddings").repartition(7), k=8
        ).collect(),
        key=lambda r: r.center_rank,
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def _heavy_tailed_docs(spark, n_docs):
    """Deterministic corpus with a REALISTIC (heavy-tailed) gram df
    distribution — the round-5 verdict's ask: the synthetic documents
    table is templated (rarest gram df≈27), so the near-linear-
    candidates claim for rarest-gram blocking was modeled, not
    measured. Here ~40 head tokens repeat everywhere (high-df grams)
    while each doc carries 3 id-derived rare tokens (df≈1 grams —
    real web text's shape, where a doc's rarest n-gram is nearly
    unique). Every 20th doc fully CONTAINS its predecessor (true
    doc-in-doc pair) plus unique junk."""
    from pyspark.sql import functions as F

    base = spark.range(0, n_docs).select(F.col("id").alias("doc_id"))
    core = (
        "concat_ws(' ', transform(sequence(0, 29), i -> "
        "CASE WHEN i % 10 = 9 THEN concat('zrare', "
        "lpad(cast(__base_id as string), 7, '0'), 'x', cast(i as string)) "
        "ELSE concat('zhead', cast((__base_id + i) % 40 as string), 'pad') "
        "END))"
    )
    return (
        base.withColumn(
            "__base_id",
            F.expr("doc_id - CASE WHEN doc_id % 20 = 1 THEN 1 ELSE 0 END"),
        )
        .withColumn(
            "text",
            F.expr(
                f"concat({core}, CASE WHEN doc_id % 20 = 1 THEN "
                "concat(' zjunk', lpad(cast(doc_id as string), 7, '0'), 'endq') "
                "ELSE '' END)"
            ),
        )
        .select("doc_id", "text")
    )


def test_containment_blocking_candidates_scale_linearly(spark):
    """Pin the blocking QUALITY claim with data: on a heavy-tailed
    gram distribution the rarest-gram candidate count stays O(corpus)
    — measured at two scales (4× docs → ≲4× candidates, never the
    quadratic blow-up frequent-gram probing gives), while recall for
    every true containment pair stays exact (the contained doc's
    rarest grams are by definition in its container)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.dedup import (
        containment_gram_arrays,
        rarest_gram_candidates,
    )

    counts = {}
    for n_docs in (200, 800):
        docs = _heavy_tailed_docs(spark, n_docs)
        garr = containment_gram_arrays(docs, n=8)
        cand = rarest_gram_candidates(garr, bottom_k=3)
        rows = cand.collect()
        counts[n_docs] = len(rows)
        pairs = {(r.id_a, r.id_b) for r in rows}
        expected = {(d - 1, d) for d in range(1, n_docs, 20)}
        missed = expected - pairs
        assert not missed, f"true containment pairs missed at {n_docs}: {missed}"
        # candidates per doc bounded by a small constant (expected
        # ~n/20 true pairs + few accidentals; 0.5/doc is generous)
        assert len(rows) <= 0.5 * n_docs, (n_docs, len(rows))
    # near-linear growth: 4x docs -> at most ~6x candidates (the
    # quadratic alternative would give ~16x)
    assert counts[800] <= 6 * max(counts[200], 1), counts


def test_hll_portable_merge_law(spark):
    """Register-wise MAX of per-wave HLL states must equal the
    single-pass register table (the HLL union law) — so wave-split
    maintenance can never change the estimate."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.sketch import hll_estimate, hll_registers

    rows = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    full = hll_registers(rows, ["g"], "CAST(v AS STRING)")
    halves = [rows.filter(F.col("v") % 2 == i) for i in (0, 1)]
    folded = (
        hll_registers(halves[0], ["g"], "CAST(v AS STRING)")
        .unionByName(hll_registers(halves[1], ["g"], "CAST(v AS STRING)"))
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, folded.collect())
    )
    # the estimate lands within the guard band of the true ~1667/group
    for r in hll_estimate(full, ["g"]).collect():
        assert abs(r.est6 - 5000 / 3) / (5000 / 3) < 0.35, r


def test_jl_projection_preserves_pairwise_distances(spark, sf_dir):
    """The JL property itself, measured: for sampled vector pairs, the
    projected squared distance divided by k stays within a loose
    distortion band of the original micro-unit squared distance
    (k=16 ⇒ σ≈0.35; band [0.2, 5] is ~4σ against random ±1 rows)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table
    from mapr_plugins_spark.operators.similarity import (
        JL_K,
        SIG_MICRO,
        jl_projection_exprs,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 12)
    ys = jl_projection_exprs("embedding", k=JL_K, dim=64)
    rows = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * F.lit(SIG_MICRO)).cast("long"),
        ).alias("vm"),
        F.array(*ys).alias("y"),
    ).collect()
    assert len(rows) >= 8
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dv = sum((a - b) ** 2 for a, b in zip(rows[i].vm, rows[j].vm))
            dy = sum((a - b) ** 2 for a, b in zip(rows[i].y, rows[j].y))
            if dv == 0:
                continue
            ratio = dy / (JL_K * dv)
            assert 0.2 <= ratio <= 5.0, (rows[i].vec_id, rows[j].vec_id, ratio)


def test_jl_rerank_recall_vs_bruteforce(spark, sf_dir):
    """The JL coarse cut (top-50 of ~500) must keep most of the exact
    top-10 — pin recall@10 ≥ 0.5 (measured headroom is higher; the
    floor catches a broken projection or cut)."""
    from mapr_plugins_spark.operators import registry as R
    from mapr_plugins_spark.operators import similarity as S
    from mapr_plugins_spark.catalog import table

    approx = {r.vec_id for r in R.x_ann_jl_rerank(spark, sf_dir).collect()}
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        r.vec_id
        for r in S.brute_force_topk(emb, S.probe_of(emb, 0), k=10).collect()
    }
    assert len(approx & exact) / 10 >= 0.5, (approx, exact)


def test_zorder_block_locality(spark, sf_dir):
    """The data-skipping law the z key exists for: within any aligned
    z block (z DIV 4^k), both coordinates are confined to 2^k-wide
    aligned ranges — so min/max file stats on a z-sorted layout prune
    BOTH dimensions. Checked for k=4 (z DIV 256 → 16-wide blocks)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.operators.registry import x_zorder_key

    df = x_zorder_key(spark, sf_dir)
    spans = (
        df.groupBy(F.expr("zkey DIV 256").alias("blk"))
        .agg(
            (F.max("za") - F.min("za")).alias("sa"),
            (F.max("zb") - F.min("zb")).alias("sb"),
        )
        .agg(F.max("sa").alias("ma"), F.max("sb").alias("mb"))
        .collect()[0]
    )
    assert spans.ma <= 15 and spans.mb <= 15, spans


def test_setsim_join_lossless_vs_brute_force(spark):
    """Prefix filtering must be LOSSLESS: on a corpus engineered so
    naive blocking would miss pairs (shared tokens only outside the
    high-df region), the blocked join reproduces the brute-force pair
    set exactly, with exact integer inter/union."""
    from mapr_plugins_spark.operators.dedup import setsim_join_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),      # J(1,2) = 4/6
            (3, "alpha beta gamma delta epsilon"),   # J(1,3) = 1
            (4, "omega psi chi phi upsilon"),        # J(·,4) = 0-ish
            (5, "alpha omega"),                       # small set, J < τ
        ],
        "doc_id BIGINT, text STRING",
    )
    po: list = []
    rows = setsim_join_pairs(docs, tau_num=3, tau_den=5, persisted_out=po).collect()
    for d in po:
        d.unpersist()
    got = {(r.id_a, r.id_b): (r.inter, r.union_size) for r in rows}
    assert got == {(1, 2): (4, 6), (1, 3): (5, 5), (2, 3): (4, 6)}
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in rows}
    assert by_pair[(1, 3)] == 1.0


def test_setsim_prefix_length_law(spark):
    """Identical sets survive any τ ≤ 1; τ just above a pair's true
    Jaccard excludes it (threshold is exact, not approximate)."""
    from mapr_plugins_spark.operators.dedup import setsim_join_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")],
        "doc_id BIGINT, text STRING",
    )
    # true Jaccard = 9/11
    po: list = []
    hit = setsim_join_pairs(docs, tau_num=9, tau_den=11, persisted_out=po).collect()
    assert [(r.id_a, r.id_b) for r in hit] == [(1, 2)]
    miss = setsim_join_pairs(docs, tau_num=10, tau_den=12, persisted_out=po).collect()
    assert miss == []
    for d in po:
        d.unpersist()


def test_assoc_rules_exact_counts(spark):
    """Hand-checkable basket fixture: counts, confidence and lift come
    out exactly; rules below min_support are absent; both directions
    of a frequent pair are emitted."""
    from mapr_plugins_spark.operators.analytics import association_rules

    rows = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
         (4, "b"), (4, "c"), (5, "a")],
        "basket BIGINT, item STRING",
    )
    out = association_rules(rows, "basket", "item", min_support=2).collect()
    by_rule = {(r.antecedent, r.consequent): r for r in out}
    # only (a,b) co-occurs in >= 2 baskets
    assert set(by_rule) == {("a", "b"), ("b", "a")}
    ab = by_rule[("a", "b")]
    assert (ab.pair_count, ab.ante_count, ab.cons_count, ab.n_baskets) == (2, 4, 3, 5)
    assert ab.support == 2 / 5 and ab.confidence == 2 / 4
    assert ab.lift == (2 * 5) / (4 * 3)
    ba = by_rule[("b", "a")]
    assert ba.confidence == 2 / 3 and ba.lift == ab.lift  # lift is symmetric


def test_holt_linear_hand_computed(spark):
    """Recurrence check against a hand-evaluated series and the
    constant-series law (level locks to the constant, trend stays 0)."""
    from mapr_plugins_spark.operators.analytics import holt_linear

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 14.0), ("k", 3, 18.0),
         ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0)],
        "key STRING, t INT, v DOUBLE",
    )
    out = {r.key: r for r in holt_linear(
        df, "key", ["t"], "v", alpha=0.5, beta=0.25, horizons=(1, 3)
    ).collect()}
    # k: l1=10,b1=0; l2=.5*14+.5*10=12, b2=.25*2=0.5;
    #    l3=.5*18+.5*12.5=15.25, b3=.25*3.25+.75*0.5=1.1875
    k = out["k"]
    assert (k.n_obs, k.level, k.trend) == (3, 15.25, 1.1875)
    assert k.forecast_1 == 15.25 + 1.1875 and k.forecast_3 == 15.25 + 3 * 1.1875
    c = out["c"]
    assert (c.level, c.trend, c.forecast_3) == (5.0, 0.0, 5.0)


def test_bootstrap_ci_laws(spark, sf_dir):
    """The interval must bracket the point mean, be properly ordered,
    and be invariant across runs (no RNG state)."""
    r1 = R.x_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi
    r2 = R.x_bootstrap_ci(spark, sf_dir).collect()[0]
    assert (r1.ci_lo, r1.ci_hi, r1.point_mean) == (r2.ci_lo, r2.ci_hi, r2.point_mean)


def test_poisson_weights_mean_one(spark):
    """Hash-drawn Poisson(1) weights must average ≈1 over many draws
    (the bootstrap's resample-size preservation) and never go negative."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.functions.portable_hash import with_seeded_hash60
    from mapr_plugins_spark.operators.sampling import poisson_weight_sql

    d = spark.range(0, 20000).select(F.col("id").cast("string").alias("k"))
    h = with_seeded_hash60(d, "h", "k", "'t'")
    w = h.select(F.expr(poisson_weight_sql("h")).alias("w"))
    row = w.agg(F.avg("w").alias("m"), F.min("w").alias("lo"),
                F.max("w").alias("hi")).collect()[0]
    assert 0.97 < row.m < 1.03 and row.lo >= 0 and row.hi <= 8


def test_sorted_neighborhood_finds_adjacent_typo(spark):
    """A 1-edit variant adjacent in sort order must be found; a record
    whose nearest in-block neighbors are all > max_edit_distance away
    must not pair; candidates never cross blocks."""
    from mapr_plugins_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "abcdef", "x"), (2, "abdef", "x"), (3, "zzzzzz", "x"),
         (4, "abcdef", "y")],
        "id BIGINT, v STRING, blk STRING",
    )
    rows = sorted_neighborhood_pairs(
        df, "id", "v", ["blk"], window=4, max_edit_distance=2
    ).collect()
    got = {(r.id_a, r.id_b): r.edit_dist for r in rows}
    # (1,2): deletion distance 1. (3,·): distance > 2. (4,·): other block.
    assert got == {(1, 2): 1}


def test_skipping_stats_prune_law(spark, sf_dir):
    """Zone-map soundness: a granule marked skippable must contain NO
    row matching the predicate, and the non-skippable set must cover
    every matching row (sum of matching rows == full filter count)."""
    from pyspark.sql import functions as F

    rows = R.x_skipping_stats(spark, sf_dir).collect()
    assert rows and any(r.skippable for r in rows)
    from mapr_plugins_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    in_pred = o.filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") <= "1994-03-31")
    )
    per_granule = {
        r["g"]: r["n"]
        for r in in_pred.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("g")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        if r.skippable:
            assert per_granule.get(r.granule, 0) == 0, r.granule
    assert sum(per_granule.values()) == in_pred.count()
    kept = {r.granule for r in rows if not r.skippable}
    assert set(per_granule) <= kept


def test_attribution_credit_laws(spark):
    """Exactly one first and one last credit per conversion; linear
    shares sum to the conversion value; touches after the last
    conversion attribute to nothing."""
    from mapr_plugins_spark.operators.analytics import conversion_attribution

    rows = spark.createDataFrame(
        [
            (1, 1, "click", 0.0), (1, 2, "view", 0.0), (1, 3, "purchase", 30.0),
            (1, 4, "click", 0.0), (1, 5, "purchase", 10.0),
            (1, 6, "click", 0.0),                      # dangling touch
            (2, 7, "purchase", 99.0),                  # conversion w/o touches
        ],
        "user_id BIGINT, event_id BIGINT, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = conversion_attribution(
        rows, "user_id", "ts", "event_id", "event_type",
        ("click", "view"), "purchase", "value",
    ).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conv_event_id, []).append(r)
    assert set(by_conv) == {3, 5}  # conv 7 has no touches, touch 6 dangles
    c3 = by_conv[3]
    assert sum(r.first_credit for r in c3) == 1
    assert sum(r.last_credit for r in c3) == 1
    assert sum(r.linear_value for r in c3) == 30.0
    assert {r.touch_event_id for r in c3} == {1, 2}
    (c5,) = by_conv[5]
    assert c5.touch_event_id == 4 and c5.first_credit and c5.last_credit
    assert c5.linear_value == 10.0


def test_kmeans_lloyd_separates_planted_clusters(spark):
    """Two planted groups at opposite corners must land in distinct
    clusters, co-members together; a point sitting exactly ON the
    final centroid has d2 = 0."""
    from mapr_plugins_spark.operators.similarity import kmeans_lloyd

    rows = [
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [1.0, 1.0, 1.0, 1.0]),
        (3, [1.1, 0.9, 1.0, 1.0]),
        (4, [-1.0, -1.0, -1.0, -1.0]),
        (5, [-1.0, -1.0, -1.0, -1.0]),
        (6, [-0.9, -1.1, -1.0, -1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = {r.vec_id: (r.cluster, r.d2) for r in
           kmeans_lloyd(emb, k=2, rounds=2).collect()}
    assert got[1][0] == got[2][0] == got[3][0]
    assert got[4][0] == got[5][0] == got[6][0]
    assert got[1][0] != got[4][0]
    # centroid of {1,2,3} has the mean of two identical + one jittered
    # point; the identical pair cannot sit at distance 0 unless the
    # jitter collapses — but exact-duplicate points always share d2
    assert got[1][1] == got[2][1]
    assert set(v[0] for v in got.values()) == {0, 1}


def test_kmeans_lloyd_truncating_division_matches_duckdb(spark):
    """The Python centroid fold and the oracle's CASE both truncate
    toward zero — pin the convention on negative sums (DuckDB's //
    truncates; Python's // floors, hence the sign wrap)."""
    import duckdb

    for s, n in [(-7, 2), (7, 2), (-9, 4), (9, 4), (-8, 2)]:
        py = -((-s) // n) if s < 0 else s // n
        db = duckdb.sql(
            f"SELECT CASE WHEN ({s}) < 0 THEN -((-({s})) // {n}) "
            f"ELSE ({s}) // {n} END"
        ).fetchone()[0]
        plain = duckdb.sql(f"SELECT ({s}) // {n}").fetchone()[0]
        assert py == db == plain == int(s / n)


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(spark):
    """k larger than the number of distinct locations: duplicate seeds
    produce an empty cluster after the first assignment (ties break to
    the lowest index); the empty cluster's centroid must persist
    without error and every output cluster id stays in [0, k)."""
    from mapr_plugins_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [float(i % 2), 0.0]) for i in range(1, 7)]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    out = kmeans_lloyd(emb, k=3, rounds=2).collect()
    assert len(out) == 6
    assert all(0 <= r.cluster < 3 for r in out)


def test_cascade_delete_blast_radius(spark):
    """Hand-checkable two-level cascade: tombstones {1}, orders of
    customer 1 = {10, 11}, lineitems of those orders = 3 rows."""
    from mapr_plugins_spark.operators.merge import cascade_delete

    cust = spark.createDataFrame([(1,), (2,), (3,)], "c BIGINT")
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], "o BIGINT, oc BIGINT"
    )
    line = spark.createDataFrame(
        [(10, 100), (10, 101), (11, 102), (12, 103), (13, 104)],
        "lo BIGINT, l BIGINT",
    )
    tomb = cust.filter(F.col("c") == 1).select(F.col("c").alias("k"))
    got = {
        r.table_name: (r.rows_before, r.rows_deleted, r.rows_after)
        for r in cascade_delete(
            tomb,
            [("cust", cust, "c", None), ("orders", orders, "oc", "o"),
             ("line", line, "lo", None)],
        ).collect()
    }
    assert got == {
        "cust": (3, 1, 2),
        "orders": (4, 2, 2),
        "line": (5, 3, 2),
    }


def test_mojibake_detect_counts(spark):
    """Clean ASCII → 0; a UTF-8-as-Latin-1 suffix counts each marker
    once per occurrence ('â€' at its 2-char weight)."""
    from mapr_plugins_spark.operators.text import mojibake_detect

    docs = spark.createDataFrame(
        [
            (1, "perfectly clean ascii text"),
            (2, "smart quote gone wrong: â€œquotedâ€"),
            (3, "cafÃ© and naÃ¯ve"),
            (4, "lossy�decode"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: (r.artifact_cnt, r.is_mojibake)
           for r in mojibake_detect(docs).collect()}
    assert got[1] == (0, False)
    assert got[2] == (2, True)   # two 'â€' sequences
    assert got[3] == (2, True)   # two 'Ã' lead bytes
    assert got[4] == (1, True)   # one replacement char


def test_zscore_prefix_anomaly_laws(spark):
    """Hand fixture: zero-variance prefix flags any deviation; values
    equal to the constant prefix never flag; the first min_n events
    never flag regardless of value."""
    from mapr_plugins_spark.operators.analytics import zscore_prefix_anomaly

    rows = [(1, i, float(v)) for i, v in enumerate(
        [10, 10, 10, 10, 10, 10, 1000, 10], start=1
    )]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, value DOUBLE"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {r.event_id: r for r in zscore_prefix_anomaly(
        ev, "user_id", ["ts", "event_id"], "event_id", "value"
    ).collect()}
    # events 1..5 have prefixes shorter than min_n=5 → never flagged
    for i in range(1, 6):
        assert not got[i].is_anomaly, i
    assert not got[6].is_anomaly          # equals the constant prefix
    assert got[7].is_anomaly              # spike vs sigma=0 prefix
    # event 8: prefix now contains the 1000 outlier → huge sigma, 10 is
    # within 3 sigma of the prefix mean
    assert not got[8].is_anomaly
    assert got[7].n_prev == 6 and got[7].x_micro == 1000 * 1000000


def test_zscore_stream_twin_equals_batch(spark):
    """The GroupState twin must reproduce the batch operator row for
    row at sf0.001 — same integer state fold, chunked in-order
    replay."""
    from mapr_plugins_spark.operators.registry import x_zscore_anomaly
    from mapr_plugins_spark.streaming.registry import s22_stream_zscore

    sf = "/root/testdata/sf0.001"
    batch = {(r.user_id, r.event_id): (r.x_micro, r.n_prev, r.is_anomaly)
             for r in x_zscore_anomaly(spark, sf).collect()}
    stream = {(r.user_id, r.event_id): (r.x_micro, r.n_prev, r.is_anomaly)
              for r in s22_stream_zscore(spark, sf).collect()}
    assert batch == stream


def _hw_replica(values, m=2, a=0.5, be=0.25, g=0.5):
    """Independent Python-float replica of the Holt-Winters fold (same
    IEEE doubles, different evaluator)."""
    l = b = 0.0
    s = [0.0] * m
    n = 0
    for v in values:
        if n == 0:
            l, b, s, n = float(v), 0.0, [0.0] * m, 1
            continue
        j = n % m
        l_new = a * (v - s[j]) + (1.0 - a) * (l + b)
        b = be * (l_new - l) + (1.0 - be) * b
        s[j] = g * (v - l_new) + (1.0 - g) * s[j]
        l = l_new
        n += 1
    return l, b, s, n


def test_holt_winters_matches_python_replica(spark):
    """Bit-for-bit agreement with an independent Python evaluator on an
    alternating series (m=2): the seasonal slots must separate."""
    from mapr_plugins_spark.operators.analytics import holt_winters_additive

    values = [10.0, 14.0, 9.0, 15.0, 10.5, 13.5, 9.5, 14.5]
    ev = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(values, start=1)],
        "user_id BIGINT, event_id BIGINT, value DOUBLE",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    (row,) = holt_winters_additive(
        ev, "user_id", ["ts", "event_id"], "value", m=2, horizons=(1, 2)
    ).collect()
    l, b, s, n = _hw_replica(values, m=2)
    assert (row.level, row.trend, row.season_0, row.season_1, row.n_obs) == (
        l, b, s[0], s[1], n
    )
    assert row.forecast_1 == l + 1.0 * b + s[n % 2]
    assert row.forecast_2 == l + 2.0 * b + s[(n + 1) % 2]
    # even slots (low values) vs odd slots (high) must have separated
    assert row.season_0 != row.season_1


def test_holt_winters_constant_series_is_fixed_point(spark):
    """A constant series is a fixed point: level = the constant, trend
    and every season slot exactly 0, every forecast = the constant."""
    from mapr_plugins_spark.operators.analytics import holt_winters_additive

    ev = spark.createDataFrame(
        [(1, i, 42.5) for i in range(1, 10)],
        "user_id BIGINT, event_id BIGINT, value DOUBLE",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    (row,) = holt_winters_additive(
        ev, "user_id", ["ts", "event_id"], "value", m=4
    ).collect()
    assert row.level == 42.5 and row.trend == 0.0
    assert row.season_0 == row.season_1 == row.season_2 == row.season_3 == 0.0
    assert row.forecast_1 == 42.5 and row.forecast_2 == 42.5


def test_feature_hashing_laws(spark):
    """Same token → same (bucket, sign) everywhere; k repetitions give
    |weight| = k in exactly one bucket; identical texts hash
    identically; weights never exceed the doc's token count."""
    from mapr_plugins_spark.operators.text import feature_hashing

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha"),
            (2, "alpha beta"),
            (3, "alpha beta"),
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = feature_hashing(docs, n_buckets=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    # doc 1: one token 3x -> one bucket, |weight| = 3
    assert len(by_doc[1]) == 1
    ((b1, w1),) = by_doc[1].items()
    assert abs(w1) == 3
    # identical docs 2 and 3 produce identical sparse vectors
    assert by_doc[2] == by_doc[3]
    # alpha's bucket in doc 2 carries 1/3 of doc 1's weight, same sign
    assert by_doc[2][b1] * 3 == w1
    assert all(0 <= r.bucket < 64 for r in rows)


def test_markov_transitions_row_stochastic(spark):
    """Hand fixture: counts match journeys, n_from sums its row, and
    the floored integer probabilities lie in (0, 1e6] with row sums
    within n_states of 1e6."""
    from mapr_plugins_spark.operators.analytics import markov_transitions

    rows = [(1, i, t) for i, t in enumerate("AABAB", 1)] + [
        (2, i, t) for i, t in enumerate("ABB", 1)
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, event_type STRING"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {(r.from_state, r.to_state): r for r in markov_transitions(
        ev, "user_id", ["ts", "event_id"], "event_type"
    ).collect()}
    # user1: A>A A>B B>A A>B ; user2: A>B B>B
    assert got[("A", "A")].n_pair == 1
    assert got[("A", "B")].n_pair == 3
    assert got[("B", "A")].n_pair == 1
    assert got[("B", "B")].n_pair == 1
    assert got[("A", "A")].n_from == 4 and got[("B", "B")].n_from == 2
    assert got[("A", "B")].p_micro == 750000
    assert got[("B", "A")].p_micro == 500000
    for r in got.values():
        assert 0 < r.p_micro <= 1_000_000


def test_churn_labels_gap_and_censoring(spark):
    """Gap > horizon → churned; gap within horizon → retained; events
    within a horizon of the corpus edge are censored, never labeled."""
    from mapr_plugins_spark.operators.analytics import churn_labels

    day = 86_400
    ev = spark.createDataFrame(
        [
            (1, 1, 0),            # next gap 2d -> retained
            (1, 2, 2 * day),      # next gap 10d -> churned
            (1, 3, 12 * day),     # gap to corpus end 8d, no next -> churned
            (2, 4, 20 * day),     # corpus max: censored
        ],
        "user_id BIGINT, event_id BIGINT, sec BIGINT",
    ).withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
    got = {r.event_id: (r.churned, r.censored)
           for r in churn_labels(ev, "user_id", "ts", "event_id", 7).collect()}
    assert got[1] == (False, False)
    assert got[2] == (True, False)
    assert got[3] == (True, False)
    assert got[4] == (False, True)


def test_weighted_median_laws(spark):
    """Unit weights reduce to the plain lower median; a dominant weight
    drags the median to its row."""
    from mapr_plugins_spark.operators.analytics import weighted_median

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 1),
         ("h", 1.0, 1), ("h", 2.0, 1), ("h", 3.0, 10)],
        "grp STRING, v DOUBLE, w INT",
    )
    got = {r.grp: r.weighted_median
           for r in weighted_median(df, "grp", "v", "w").collect()}
    assert got["g"] == 2.0   # lower median of 1,2,3,4
    assert got["h"] == 3.0   # weight 10 dominates


def test_canonical_replacement_survivorship_laws(spark):
    """Total map (every doc exactly once), exactly one keeper per
    cluster, the keeper is the longest member (ties to lowest id),
    singletons keep themselves."""
    from mapr_plugins_spark.operators.dedup import canonical_replacement

    corpus = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the much longer surviving text"),
            (3, "middle sized text"),
            (9, "a singleton untouched by pairs"),
        ],
        "doc_id BIGINT, text STRING",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id BIGINT, canonical_id BIGINT"
    )
    rows = canonical_replacement(corpus, clusters).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 9]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].action == "keep" and by_id[2].survivor_id == 2
    assert by_id[1].action == "replace" and by_id[1].survivor_id == 2
    assert by_id[3].action == "replace" and by_id[3].survivor_id == 2
    assert by_id[9].action == "keep" and by_id[9].cluster_id == 9
    keeps = [r for r in rows if r.action == "keep"]
    assert len(keeps) == len({r.cluster_id for r in rows})


def test_benford_profile_exact_digits(spark):
    """Digit extraction is exact at power-of-ten boundaries (the
    log10-float failure mode): 9.99→9, 10.00→1, 0.01→1; shares are
    floored integer rationals summing to ≤ 1e6."""
    from mapr_plugins_spark.operators.analytics import benford_profile

    df = spark.createDataFrame(
        [(9.99,), (10.00,), (0.01,), (99.99,), (100.00,), (1.00,), (0.03,)],
        "amt DOUBLE",
    )
    rows = benford_profile(df, "amt").collect()
    got = {r.digit: r.n_obs for r in rows}
    # 0.03's double sits just BELOW 3 cents: a truncating cast would
    # extract digit 2 (and DuckDB's rounding cast digit 3) — the
    # explicit round() pins digit 3 on both engines
    assert got == {9: 2, 1: 4, 3: 1}
    assert sum(r.p_obs_micro for r in rows) <= 1_000_000
    for r in rows:
        assert r.dev_micro == abs(r.p_obs_micro - r.p_benford_micro)


def test_blocking_quality_eval_laws(spark):
    """Precision is 1e6 by construction for a verify-stage pipeline;
    identical documents are always recalled (a band of identical
    signatures must collide); counts are consistent."""
    from mapr_plugins_spark.operators.dedup import (
        blocking_quality_eval,
        verified_near_dup_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base), (5, base), (10, base + " extra"), (15, "unrelated "
          "words entirely different from the rest of this corpus here")],
        "doc_id BIGINT, text STRING",
    )
    pairs = verified_near_dup_pairs(docs, threshold=0.5)
    (row,) = blocking_quality_eval(docs, pairs, sample_mod=5).collect()
    assert row.precision_micro == 1_000_000
    assert row.n_hit == row.n_blocked <= row.n_exact
    # the identical pair (0,5) is structurally unmissable
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 5) in got
    assert row.n_exact >= 1 and row.recall_micro > 0


def test_auc_exact_known_values(spark):
    """Perfect separation → 1.0; all-tied scores → exactly 0.5 (the
    average-rank convention); a hand-computed mixed case."""
    from mapr_plugins_spark.operators.analytics import auc_exact

    perfect = spark.createDataFrame(
        [(1, False), (2, False), (3, True), (4, True)], "s BIGINT, y BOOLEAN"
    )
    assert auc_exact(perfect, "s", "y").collect()[0].auc_micro == 1_000_000
    tied = spark.createDataFrame(
        [(7, False), (7, True), (7, False), (7, True)], "s BIGINT, y BOOLEAN"
    )
    assert auc_exact(tied, "s", "y").collect()[0].auc_micro == 500_000
    # scores: neg {1, 3}, pos {2, 4} -> pairs won 3 of 4 -> 0.75
    mixed = spark.createDataFrame(
        [(1, False), (2, True), (3, False), (4, True)], "s BIGINT, y BOOLEAN"
    )
    row = auc_exact(mixed, "s", "y").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc_micro) == (2, 2, 750_000)


def test_calibration_bins_partition_laws(spark):
    """Bins partition the eval set (Σn = N, sizes differ by ≤1), rates
    are floored rationals, and a monotone score→label relationship
    yields a monotone reliability curve on this fixture."""
    from mapr_plugins_spark.operators.analytics import calibration_bins

    rows = [(i, i, i >= 60) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, s BIGINT, y BOOLEAN")
    bins = sorted(
        calibration_bins(df, "s", "y", "doc_id", n_bins=10).collect(),
        key=lambda r: r.bin,
    )
    assert sum(r.n for r in bins) == 100
    assert {r.n for r in bins} == {10}
    rates = [r.pos_rate_micro for r in bins]
    assert rates == sorted(rates)
    assert rates[0] == 0 and rates[-1] == 1_000_000
    assert bins[5].score_lo == 51 and bins[5].score_hi == 60


def test_golden_record_majority_survivorship(spark):
    """Majority wins per attribute; ties break lexicographically;
    singletons pass through; the entity table is total."""
    from mapr_plugins_spark.operators.dedup import golden_record

    records = spark.createDataFrame(
        [
            (1, "Acme Corp", 5), (2, "Acme Corp", 5), (3, "Acme Korp", 7),
            (9, "Loner LLC", 3),
        ],
        "rid BIGINT, name STRING, nk INT",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "rid BIGINT, canonical_id BIGINT"
    )
    rows = golden_record(records, clusters, "rid", ["name", "nk"]).collect()
    got = {r.cluster_id: r for r in rows}
    assert set(got) == {1, 9}
    assert got[1].n_members == 3
    assert got[1].golden_name == "Acme Corp"   # 2-vs-1 majority
    assert got[1].golden_nk == 5
    assert got[9].n_members == 1 and got[9].golden_name == "Loner LLC"


def test_ks_drift_known_values(spark):
    """Identical samples → D = 0; disjoint supports → D = 1; a
    hand-computed half-shift."""
    from mapr_plugins_spark.operators.analytics import ks_drift

    same = spark.createDataFrame(
        [(float(v), t) for v in (1, 2, 3, 4) for t in ("a", "b")],
        "value DOUBLE, grp STRING",
    )
    r = ks_drift(same, F.col("grp") == "a", "value").collect()[0]
    assert (r.n_ref, r.n_cur, r.d_micro) == (4, 4, 0)
    disjoint = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (11.0, "b"), (12.0, "b")],
        "value DOUBLE, grp STRING",
    )
    r = ks_drift(disjoint, F.col("grp") == "a", "value").collect()[0]
    assert r.d_micro == 1_000_000
    # ref {1,2}, cur {2,3}: ECDF gap max at bucket 1: |1/2 - 0| = 1/2
    half = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")],
        "value DOUBLE, grp STRING",
    )
    r = ks_drift(half, F.col("grp") == "a", "value").collect()[0]
    assert r.d_micro == 500_000


def test_ngram_novelty_ordering_laws(spark):
    """The first document is 100% novel; an exact copy later is 0%
    novel; a half-overlapping doc scores its true fraction."""
    from mapr_plugins_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: abc, bcd
            (2, "a b c d"),          # copy -> 0 novel
            (3, "b c d e"),          # grams: bcd(seen), cde(new) -> 1/2
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty_micro)
           for r in ngram_novelty(docs).collect()}
    assert got[1] == (2, 2, 1_000_000)
    assert got[2] == (2, 0, 0)
    assert got[3] == (2, 1, 500_000)


def test_mmr_rerank_diversifies(spark):
    """Rank 1 is pure relevance; a near-duplicate of the top result is
    deferred in favor of a diverse runner-up (the MMR property); mmr2
    equals rel_dot at rank 1 and rel − max_sim afterwards."""
    from mapr_plugins_spark.operators.similarity import mmr_rerank

    # probe id 0 (0 % 97 == 0). 102 duplicates 101 exactly, so its
    # self-similarity penalty (|101|^2 > rel, vectors longer than the
    # unit probe) drives its MMR below the diverse 103's.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # the probe itself
        (101, [1.0, 0.1, 0.0, 0.0]),
        (102, [1.0, 0.1, 0.0, 0.0]),     # exact duplicate of 101
        (103, [0.5, 0.0, 0.9, 0.0]),     # diverse, lower relevance
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = sorted(
        mmr_rerank(emb, k=3, n_candidates=10).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in got] == [101, 103, 102]
    assert got[0].mmr2 == got[0].rel_dot
    assert got[1].mmr2 < got[1].rel_dot


def test_tokenizer_fertility_ratio_laws(spark):
    """chars/token ≥ 1e6 would mean >1 char per token on average —
    check hand-computable single-word docs: with no merges applicable,
    tokens = chars, so fertility ratios are exact."""
    from mapr_plugins_spark.operators.text import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "xyz", "a"), (2, "qq vv", "a")],
        "doc_id BIGINT, text STRING, source STRING",
    )
    (row,) = tokenizer_fertility(docs).collect()
    # no merge in the shipped 8-merge table applies to xyz/qq/vv:
    # tokens == chars (3 + 4), words = 1 + 2, chars = 3 + 4
    assert (row.total_chars, row.total_tokens, row.total_words) == (7, 7, 3)
    assert row.chars_per_token_micro == 1_000_000
    assert row.tokens_per_word_micro == 7 * 1_000_000 // 3


def test_length_profile_buckets(spark):
    """Binary-digit bucketing: lengths 1, 2-3, 4-7 land in buckets
    1, 2, 3; shares are floored per-group rationals summing ≤ 1e6."""
    from pyspark.sql import functions as F  # noqa: F401

    from mapr_plugins_spark.operators.text import length_profile

    docs = spark.createDataFrame(
        [("s", 1), ("s", 2), ("s", 3), ("s", 4), ("s", 7), ("s", 8)],
        "source STRING, n_chars BIGINT",
    )
    rows = length_profile(docs).collect()
    got = {r.bucket: r.n_docs for r in rows}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
    assert sum(r.share_micro for r in rows) <= 1_000_000


def test_incremental_novelty_laws(spark):
    """A wave doc made entirely of existing grams scores 0; a fully
    fresh doc scores 1e6; a half-overlap doc scores its true
    fraction; docs in no wave never appear."""
    from mapr_plugins_spark.operators.dedup import incremental_novelty

    existing = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id BIGINT, text STRING"
    )
    wave = spark.createDataFrame(
        [
            (4, "a b c d e"),      # all grams seen -> 0
            (8, "x y z w v"),      # all fresh -> 1e6
            (12, "c d e x y"),     # grams: cde(seen), dex, exy -> 2/3
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: (r.n_grams, r.n_new, r.novelty_micro)
           for r in incremental_novelty(existing, wave).collect()}
    assert got[4] == (3, 0, 0)
    assert got[8] == (3, 3, 1_000_000)
    assert got[12] == (3, 2, 2_000_000 // 3)


def test_wave_ingest_report_partitions_corpus(spark):
    """The four waves partition the corpus exactly and every rate is a
    valid floored rational in [0, 1e6]."""
    from mapr_plugins_spark.operators.registry import x_wave_ingest_report

    rows = x_wave_ingest_report(spark, "/root/testdata/sf0.001").collect()
    assert {r.wave for r in rows} == {0, 1, 2, 3}
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert 0 <= r.keep_rate_micro <= 1_000_000
        assert 0 <= r.en_rate_micro <= 1_000_000
        assert r.total_tokens >= r.n_docs  # docs have >= 1 token


def test_join_cardinality_overestimates_and_is_tight_without_collisions(spark):
    """CMS inner product is a provable overestimate; with far fewer
    keys than sketch width it is EXACT (no collisions); with heavy
    multiplicity the true value weights in exactly."""
    from mapr_plugins_spark.operators.sketch import cms_join_size_estimate

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "ka BIGINT"
    )
    b = spark.createDataFrame(
        [(1,), (2,), (2,), (9,)], "kb BIGINT"
    )
    (row,) = cms_join_size_estimate(a, "ka", b, "kb",
                                    width=64, depth=4).collect()
    # true = f_a(1)*f_b(1) + f_a(2)*f_b(2) = 2*1 + 1*2 = 4
    assert row.true_join_size == 4
    assert row.est_join_size >= row.true_join_size
    assert row.overestimate_micro >= 0
    # 4 distinct keys into 64 buckets: every depth row is collision-free
    # with overwhelming likelihood under the fixed portable hash — and
    # since the hash is DETERMINISTIC this is a stable fact, not a
    # probabilistic claim: pin exactness
    assert row.est_join_size == 4


def test_rare_collapse_threshold_law(spark):
    """Categories at/above the threshold survive; below fold into
    '__other__'; the map is total."""
    from mapr_plugins_spark.operators.analytics import rare_category_collapse

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "rid BIGINT, cat STRING",
    )
    got = {r.rid: (r.encoded_category, r.category_count)
           for r in rare_category_collapse(df, "cat", "rid", 2).collect()}
    assert len(got) == 6
    assert got[1] == ("a", 3) and got[4] == ("b", 2)
    assert got[6] == ("__other__", 1)


def test_welch_t2_known_values(spark):
    """Identical populations → t² = 0 / not significant; a gross mean
    shift with tiny variance → significant; symmetric in group
    labeling (t² is squared)."""
    from mapr_plugins_spark.operators.analytics import welch_t2

    same = spark.createDataFrame(
        [(float(v), g) for v in (10, 20, 30) for g in ("a", "b")],
        "value DOUBLE, grp STRING",
    )
    r = welch_t2(same, F.col("grp") == "a", "value").collect()[0]
    assert r.t2_micro == 0 and not r.significant
    shifted = spark.createDataFrame(
        [(10.0, "a"), (10.1, "a"), (9.9, "a"),
         (50.0, "b"), (50.1, "b"), (49.9, "b")],
        "value DOUBLE, grp STRING",
    )
    r1 = welch_t2(shifted, F.col("grp") == "a", "value").collect()[0]
    r2 = welch_t2(shifted, F.col("grp") == "b", "value").collect()[0]
    assert r1.significant and r2.significant
    assert r1.t2_micro == r2.t2_micro  # squared statistic is symmetric
    assert (r1.n_a, r1.n_b) == (3, 3)


def test_portable_ln_micro_matches_math_log(spark):
    """The sqrt-range-reduced portable ln agrees with math.log to
    ~1e-10 absolute across six orders of magnitude, in BOTH engines,
    and the two engines agree bit-for-bit (the reason it exists:
    native ln differs in the last ulp and flips micro units)."""
    import math

    import duckdb

    from mapr_plugins_spark.functions.portable_hash import (
        portable_ln_micro_sql,
    )

    for num, den in [(1, 1000), (1, 2), (9, 10), (1, 1), (13, 7),
                     (100, 1), (99991, 3)]:
        expr = portable_ln_micro_sql(
            f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
        )
        d = duckdb.sql(f"SELECT {expr}").fetchone()[0]
        s = spark.sql(f"SELECT {expr} AS v").collect()[0].v
        assert d == s, (num, den)
        assert abs(d - round(math.log(num / den) * 1e6)) <= 1, (num, den)


def test_psi_drift_laws(spark):
    """Identical populations → every term 0 and PSI = 0; a gross
    location shift → PSI far past the 0.25 action line."""
    from mapr_plugins_spark.operators.analytics import psi_drift

    same = spark.createDataFrame(
        [(float(v), g) for v in (5, 15, 25, 35, 45) for g in ("a", "b")],
        "value DOUBLE, grp STRING",
    )
    rows = psi_drift(same, F.col("grp") == "a", "value",
                     n_bins=5, lo=0.0, hi=50.0).collect()
    assert all(r.term_micro == 0 for r in rows)
    assert rows[0].psi_micro == 0
    shifted = spark.createDataFrame(
        [(5.0, "a")] * 20 + [(45.0, "b")] * 20, "value DOUBLE, grp STRING"
    )
    (row, *_) = psi_drift(shifted, F.col("grp") == "a", "value",
                          n_bins=5, lo=0.0, hi=50.0).collect()
    assert row.psi_micro > 250_000
