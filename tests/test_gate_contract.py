"""Driver-gate contract guards: the first 50 queries() entries are the
hash-checked surface — their set and order must not drift by accident,
and every one must carry an oracle."""

from __future__ import annotations

import __spark_entry__ as E

# round-4 rotation: bm25_topk, cdc_merge, export_curated, graph_stats,
# histogram_quantiles, ab_test_report promoted in-cap (VERDICT r3 #3);
# their family siblings moved to the oracle-backed overflow window.
# Late round 4: leakage_safe_splits promoted in-cap (new flagship
# composition — components + component-keyed split); label_centroids
# (driver-green in r03) rotated to overflow. Second late-round-4
# rotation: local_supplier_revenue (full Q5), duplicate_spans,
# sq_rerank_full, source_divergence promoted; orders_rollup,
# repeat_customers, user_event_pivot, props_k_stats (all driver-green
# r3/r4) rotated to overflow.
# Round-5 rotation (VERDICT r4 #5 + new flagships): bm25_topk_indexed,
# split_leakage_audit, perplexity_buckets, excess_supply_suppliers
# (Q20), ivfsq_rerank_full, semantic_dedup_blocked,
# graphann_rerank_full (5th index shape), decontaminate_bloom
# promoted; hybrid_rrf, document_splits, winnowing_fingerprints,
# customers_without_orders, customer_revenue_deciles,
# purchase_attribution, surge_windows, events_in_surges (all
# driver-green r3/r4) rotated to overflow. Late round 5: dsir_select
# (Gumbel top-k importance resample) and neardup_edit_distance
# (banded Levenshtein near-dup) promoted; bm25_topk and decontaminate
# (driver-green r2-r4; families in-cap via bm25_topk_indexed /
# decontaminate_bloom) rotated to overflow.
# Round-6 rotation (13 swaps; every promoted entry is oracle-backed,
# every displaced entry is driver-green r5 or earlier with its family
# still represented in-cap): script_profile<-text_stats,
# heavy_hitters_topk<-chunk_documents,
# kneser_ney_logprob<-perplexity_buckets,
# dedup_ngram_prefix<-dedup_exact_groups, snapshot_diff<-cdc_merge,
# semantic_decontaminate<-neardup_cosine,
# expectations_report<-source_token_budget,
# curation_reasons<-pii_redaction,
# stream_decontaminate<-events_hourly_stream,
# opq_rerank_full<-pq_rerank_full, ivfopq_rerank_full<-ivfsq_rerank_full,
# prefixdim_rerank_full<-sq_rerank_full,
# topk_cosine_filtered_gann<-graphann_rerank_full.
# Round-7 rotation (6 swaps; promoted entries are round-6 additions,
# oracle-backed, never driver-checked; displaced entries are
# driver-green r1-r6 with their family still in-cap):
# snapshot_diff_summary<-events_distinct_pairs,
# lang_id_confusion<-session_rollup, range_search_ivf<-pricing_summary,
# psi_drift<-revenue_by_nation,
# expectations_events<-top_customers_per_nation,
# histogram_store_quantiles<-histogram_quantiles.
# Late round-7 rotation (4 swaps; promoted entries are the round-7
# operator families, oracle-backed): tfidf_cosine_pairs<-
# dedup_minhash_md5 (md5 banding stays in-cap via
# neardup_edit_distance), tfidf_cosine_prefix<-export_curated,
# sorted_neighborhood<-graph_stats, tfidf_related_docs<-hourly_locf.
# Round-8 rotation (6 swaps; promoted entries are the VERDICT r7 #8
# asks plus the round-8 additions, all oracle-backed; displaced
# entries are driver-green r4-r7 with their family still in-cap):
# snm_dedup_groups<-dedup_components (components family stays via
# dedup_components_twostar — same oracle),
# dedup_components_twostar<-snapshot_diff_summary (snapshot_diff
# stays), dedup_ngram_containment<-lang_id_confusion (text analysis
# stays via script_profile/quality_filter),
# paragraph_dedup<-local_supplier_revenue (TPC-H stays via
# excess_supply_suppliers), domain_caps<-ab_test_report (experiment
# family in overflow via ab_test_cuped), ks_drift<-source_divergence.
# Round-8 session-2 rotation (3 swaps; promoted entries are the new
# session-2 operator families, oracle-backed; displaced entries are
# driver-green with their family still in-cap):
# retrieval_quality<-user_running_totals (stateful streaming stays via
# stream_decontaminate + stream_interval_join),
# kmv_user_overlap<-range_search_ivf (range family stays via
# range_search_cosine in overflow — same shared oracle),
# logreg_report<-histogram_store_quantiles (quantile stores stay via
# histogram_quantiles + tdigest_quantiles in overflow). Late round-8
# session 2: lsh_calibration<-duplicate_spans (span family stays via
# dedup_ngram_prefix in-cap + duplicate_spans/remove_duplicate_spans
# in overflow). Final round-8 session-2 swap:
# kmeans_lloyd<-curation_reasons (curation stages stay in-cap via
# curate_corpus — same CTE chain).
# Round-9 rotation (VERDICT r8 #2 — promote the round-8 flagships;
# each retired entry is driver-green with its family still in-cap):
# scd2_history<-snm_dedup_groups (SNM composition stays via
# sorted_neighborhood + dedup_components_twostar),
# label_model<-dedup_ngram_containment (n-gram pairs stay via
# dedup_ngram_prefix), power_iteration_pc1<-ivfopq_rerank_full (PQ
# rerank rung stays via opq_rerank_full),
# phrase_search<-prefixdim_rerank_full (shortlist->rerank stays via
# opq_rerank_full), wet_roundtrip<-decontaminate_bloom (decontam
# stays via semantic_decontaminate + stream_decontaminate),
# logreg_calibration<-tfidf_related_docs (sparse lexical stays via
# tfidf_cosine_pairs + tfidf_cosine_prefix). Round-9 session 2
# (strictly-stronger same-family swaps; each retired entry keeps its
# own oracle in overflow): incremental_snapshot_loop<-incremental_dedup
# (the loop CONTAINS the screen), kneser_ney5_logprob<-
# kneser_ney_logprob (production order vs its order-2 special case),
# duplicate_char_spans<-neardup_edit_distance (char-grain
# exact-substring vs banded edit-distance; banding family stays via
# dedup_ngram_prefix).
# Round-10 rotation (VERDICT r9 #4 — promote the round-9 flagships;
# each retired entry is driver-green with its family still in-cap and
# keeps its own oracle in overflow):
# kneser_ney5_modified<-kneser_ney5_logprob (modified KN is the
# production/KenLM default; fixed-discount twin to overflow),
# curate_corpus_production<-curate_corpus (the FineWeb-recipe config
# vs the generic-quality chain it modernizes),
# production_mix_report<-expectations_report (expectations family
# stays via expectations_events),
# decontaminate_13gram<-semantic_decontaminate (decontam family stays
# via decontaminate_13gram + stream_decontaminate in-cap).
# Round-10 session 2 (strictly-stronger / new-family swaps; each
# retired entry keeps its own oracle in overflow):
# snapshot_loop_semantic<-incremental_snapshot_loop (the semantic loop
# CONTAINS the default loop — same stages plus the embedding-cosine
# third screen), line_dedup<-paragraph_dedup (CCNet boilerplate-line
# strip, the corpus-wide line-grain aggregate; sub-doc grain stays
# in-cap via duplicate_char_spans).
# Round-11 rotation (VERDICT r10 #6 — promote the round-10 release
# artifacts; each retired entry is driver-green r10 with its family
# still in-cap and keeps its own oracle in overflow):
# decontamination_sweep<-decontaminate_13gram (the 13-gram config is
# one row of the sweep's grid; decontam family stays via the sweep +
# stream_decontaminate), production_funnel<-curate_corpus_production
# (same production flags chain, aggregated to the per-stage retention
# artifact; production-config family stays via production_mix_report).
# Round-11 session 2 (strictly-stronger same-family swap, the r10-s2
# precedent): snapshot_loop_full<-snapshot_loop_semantic (the full
# shape CONTAINS the semantic loop — same stages + the CCNet line
# evidence + the FineWeb production gate, one hash-checked CTE chain;
# the semantic loop keeps its own oracle in overflow).
EXPECTED_IN_CAP = [
    "topk_cosine", "topk_cosine_filtered", "topk_cosine_filtered_ivf",
    "knn_join_cosine", "ivf_knn_join_dist", "kmeans_tree_full",
    "script_profile", "quality_filter", "bm25_topk_indexed",
    "snapshot_loop_full", "split_leakage_audit", "heavy_hitters_topk",
    "kneser_ney5_modified", "dedup_ngram_prefix", "snapshot_diff",
    "decontamination_sweep", "tfidf_cosine_pairs", "dsir_select",
    "duplicate_char_spans",
    "production_funnel", "tfidf_cosine_prefix", "repetition_signals",
    "opq_rerank_full", "stream_interval_join", "scd2_history",
    "leakage_safe_splits",
    "sorted_neighborhood", "production_mix_report", "kmeans_lloyd",
    "multimodal_meta", "stream_decontaminate", "dedup_components_twostar",
    "label_model", "retrieval_quality", "kmv_user_overlap",
    "psi_drift", "expectations_events",
    "line_dedup", "excess_supply_suppliers",
    "lsh_calibration", "power_iteration_pc1", "phrase_search",
    "sql_topk_cosine", "semantic_dedup_blocked",
    "topk_cosine_filtered_gann",
    "wet_roundtrip", "logreg_calibration", "logreg_report",
    "domain_caps", "ks_drift",
]


def test_in_cap_order_is_pinned():
    got = list(E.queries().keys())[:50]
    assert got == EXPECTED_IN_CAP


def test_every_in_cap_entry_has_an_oracle():
    qs = list(E.queries().keys())[:50]
    oracles = E.oracle_sql()
    assert [k for k in qs if k not in oracles] == []


def test_no_duplicate_entries_and_no_orphan_oracles():
    qs = E.queries()
    names = list(qs.keys())
    assert len(names) == len(set(names))
    orphans = set(E.oracle_sql()) - set(names)
    assert orphans == set()
