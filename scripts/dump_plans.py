"""Regenerate PLANS.md: formatted physical plans for headline queries.

Evidence artifact for the scale posture: shows pushed filters, pruned
read schemas, broadcast joins, partial aggregation, TakeOrdered top-k,
and whole-stage-codegen spans exactly as Catalyst plans them (the same
properties tests/test_plans.py pins). Run from the repo root:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: (query key, what the plan demonstrates)
SHOWCASE = [
    ("q01_filter_project", "filter pushdown + column pruning reach the parquet scan"),
    ("q03_revenue_by_nation", "broadcast dimension joins + partial/final aggregation"),
    ("q12_topk", "top-k plans as TakeOrderedAndProject, never a global sort"),
    ("q07_range_join", "range join keeps an equi component (no cartesian)"),
    ("x_dedup_minhash_pairs", "row-local signatures; first exchange is the band self-join"),
    ("x_bloom_semi_join", "bitset prefilter sits under the scan-side filter, before the join"),
    ("x_doc_chunk", "chunking is a zero-key-shuffle projection pipeline"),
    ("x_hypertable_rollup", "multi-granularity rollup is ONE Expand + one shuffle"),
    ("x_ewma", "explicit full-width repartition feeds the Arrow stage (AQE-coalesce exempt)"),
    ("x_fuzzy_join_levenshtein", "edit-distance predicate rides an equi hash join on the block key"),
    ("x_fuzzy_join_capped", "the group-width valve adds one name-key window before expansion; pair mining unchanged"),
    ("x_row_index", "global index = range shuffle + broadcast offsets, all JVM-side (no Python stage)"),
    ("x_ann_ivf_batch", "batch ANN probes join the corpus on list_id (equi join, no per-probe crossJoin)"),
    ("q62_sessionize", "two window passes share ONE hash partitioning on user_id (single exchange)"),
    ("x_substr_dedup", "substring dedup shuffles BIGINT window hashes (no Python stage, no gram-text shuffle)"),
    ("x_semantic_dedup", "SemDeDup cell assignment is ONE ArrowEvalPython stage (two-level int64-matmul routing, no shuffle) plus driver-side count/seed sizing jobs; the only exchange keys the within-cluster pair join"),
    ("x_semantic_dedup_trained", "trained-centroid-table path: IDENTICAL plan shape to the default — the centroid provenance changes only the driver-side collect, never the distributed plan"),
    ("x_semantic_dedup_codebook", "fixed-size codebook: same trained-path plan; the centroid filter is one pushed-down modulo predicate"),
    ("x_cdc_chunk_dedup", "content-defined chunk sets build row-locally; candidates bucket-join on BIGINT chunk keys"),
    ("x_cdc_chunk_dedup_capped", "the stop-chunk valve adds one aggregate + semi join before candidates; zero broadcasts, all hash builds"),
    ("x_lm_score", "bigram-LM shuffles count keys, not documents; vocabulary size broadcasts as a 1-row aggregate"),
    ("x_embed_pq_encode", "PQ compression is a zero-shuffle codegen scan against a literal codebook"),
    ("x_ann_ivfpq_topk", "IVF-PQ: broadcast per-list distance tables + list_id filter; corpus scan reads codes, ranking is TakeOrdered"),
    ("x_bpe_encode", "BPE tokenization is an ordered literal-replace chain inside whole-stage codegen"),
    ("x_scd2_build", "both SCD2 window passes share one user_id partitioning (single exchange)"),
    ("x_spatial_join", "all-pairs radius search rides an equi hash join on the grid cell (no cartesian)"),
    ("x_epoch_shuffle", "epoch permutation = codegen md5 + one range exchange + broadcast offsets, all JVM-side"),
    ("x_pmi_collocations", "PMI shuffles bigram/marginal count keys, never documents; N broadcasts as a 1-row aggregate"),
    ("x_triangle_estimate_prod", "DOULION coin is pushed INTO the edge-derivation join condition (pre-distinct pruning); all wedge joins stay equi"),
    ("x_bpe_encode_fast", "production-merge-count BPE is ONE ArrowEvalPython stage — plan size O(1) in the merge table"),
    ("x_temperature_mix", "temperature rates broadcast from a 1-row-per-source aggregate; the corpus never shuffles"),
    ("x_dedup_containment", "rarest-gram candidate join is hint-free (keyed shuffle; AQE may choose broadcast); the verify join moves one gram array per candidate doc"),
    ("x_setsim_join", "prefix-filter candidates bucket-join on the prefix token; size filter precedes verify; no forced broadcast anywhere"),
    ("x_assoc_rules", "a-priori semi-join prunes items BEFORE the basket self-join; counts partial-aggregate map-side"),
    ("x_holt_trend", "Holt fold is one hash aggregate + a codegen HOF projection — no Python stage, no second exchange"),
    ("x_bootstrap_ci", "replicate explosion is a shuffle-free ×R map; means partial-aggregate into R cells; order stats sort R rows"),
    ("x_attribution", "conversion-group windows and the touch-conversion join share ONE user-key partitioning"),
    ("x_kmeans_lloyd", "final k-means assignment is a shuffle-free codegen projection against literal centroids"),
    ("x_delete_propagate", "cascade hops are unhinted left-semi joins; the only BNLJ sites are 1-row scalar attaches"),
    ("x_zscore_anomaly", "one user-key exchange; the prefix window and the integer z-test ride it in codegen"),
    ("x_holt_winters", "seasonal fold = one hash aggregate + a codegen HOF projection (same shape as Holt)"),
    ("x_feature_hashing", "hashing trick = explode + ONE map-side-combined (doc,bucket) aggregate, md5 in codegen"),
    ("x_markov_transitions", "lead window and pair aggregate; totals join on the from-state key"),
    ("x_classifier_auc", "AUC runs on the per-score histogram: corpus partial-aggregates map-side, the window sees only distinct scores"),
    ("x_golden_record", "every survivorship vote and window shares one cluster-id partitioning"),
    ("x_blocking_recall", "the only cross join is the deterministic sample^2 eval budget; the pipeline under test stays banded"),
    ("x_join_cardinality", "join sizing = two independent CMS builds + a sketch-sized inner product; neither relation shuffles"),
    ("x_incremental_novelty", "wave grams LEFT-ANTI probe the gram store on the key; O(wave) work, no corpus rescan"),
    ("x_ab_ttest", "one 2-group map-side-combined aggregate; the t^2 rational is a codegen projection"),
]


def main() -> None:
    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    registry = E.queries()
    out = io.StringIO()
    out.write(
        "# PLANS — physical-plan evidence for the scale posture\n\n"
        "Generated by `python scripts/dump_plans.py` (Spark "
        f"{spark.version}, sf dir `{SF_DIR}`). Machine-checked versions "
        "of these properties live in `tests/test_plans.py`; this file "
        "is the human-readable exhibit.\n"
    )
    for key, why in SHOWCASE:
        df = registry[key](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        out.write(f"\n## {key}\n\n*{why}*\n\n```\n{plan}```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
