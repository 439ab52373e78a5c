#!/bin/bash
# Round-15 10x correctness gate (VERDICT r14 ask #5: rotate again —
# ~119 rows had never been decade-checked after r14; two more
# rotations cover the full surface):
#   - PRIOR: every row green in r14's gate (heavy tail + recall rows
#     + r13/r14 rotations) — 81 rows, kept green round-over-round
#   - NEW: this round's rows (q201 fixed-band Hamming LSH, q202
#     self-scaling-band variant — the multimodal family's first
#     oracle rows)
#   - ROTATION (r15): 33 rows never 10x-hash-checked before, drawn
#     across the remaining families — envelope tail (q08/q12/q16/
#     q18/q20), cdc/quantize (q36/q38), join shapes (q41/q58/q69/
#     q72/q78), sampling/pack (q42/q46/q49/q50), stats (q60/q61/q92/
#     q99), text/sketch (q68/q71/q115/q148/q165), windows (q80/q85),
#     TPC-H tail (q102/q110), vector top-k (q27/q126/q133), plus the
#     two rows the r14 driver flagged unstable (q91/q163) so their
#     CORRECTNESS at the decade is on record beside the retimes.
#   - REST (r15, second pass): the remaining 85 never-checked rows ran
#     through the same flow (same replica, budget 1800) and merged in —
#     CORRECTNESS_10x.json now carries ALL 202 oracle rows green at the
#     decade; future rounds keep the full surface green rather than
#     rotating.
# Usage: bash tools/run_10x_gate.sh [budget_sec]
set -e
cd "$(dirname "$0")/.."
SF=/tmp/graft_10x_sf0.1_v4
OUT=/tmp/verify_10x_r15
BUDGET=${1:-1800}

PRIOR="q128_clean_corpus,q135_unpivot,q141_semdedup,q149_pagerank,q154_kmeans,q158_covariance,q170_curation_pipeline,q171_knn_join,q173_contrastive_pairs,q174_kn_bigram,q17_json_extract,q181_jl_project,q183_kmv_algebra,q188_two_level_dedup,q23_langid,q25_minhash,q28_near_dups,q34_embedding_neardups,q44_jaccard_dedup,q47_dedup_clusters,q55_rollup,q74_scalar_subquery,q84_multi_distinct,q194_probe_pair_cost,q195_two_level_dedup_np2,q191_two_level_recall_np1,q192_two_level_recall_np2,q193_two_level_recall_np4,q196_two_level_recall_wide,q197_retrieval_operating_point,q198_retrieval_pair_cost,q01_agg,q04_latest_row,q05_txn_sequence,q07_reconcile_anti,q09_tables_listing,q11_fingerprint,q21_dedup_exact,q24_quality,q26_simhash,q29_sessionize,q40_asof_join,q45_kmv_distinct,q53_local_supplier_volume,q56_pivot,q63_tfidf,q67_setops,q75_grouping_sets,q96_retention,q160_span_cut,q175_skew_report,q177_url_dedup,q186_incremental_sessions,q02_keyset_page,q03_import_envelope,q06_insert_result,q10_backoff,q13_table_filter,q14_job_eligibility,q15_job_acquire,q31_tumbling_window,q37_grouped_topk,q39_percentiles,q43_rolling,q35_ship_priority,q54_returned_items,q62_vocab,q64_bm25,q66_histogram,q90_funnel,q93_entropy,q98_gini,q101_promo_revenue,q109_market_share,q129_date_features,q139_pii_scrub,q140_url_normalize,q146_group_sample,q164_token_budget,q199_neardups_selfscaling,q200_store_retrieval_dial"
NEW="q201_banded_hamming,q202_banded_hamming_auto"
ROTATION="q08_reconcile_semi,q12_operation_derive,q16_group_tables,q18_changelog_union,q20_topk,q27_cosine_topk,q36_cdc_apply,q38_quantize,q41_range_join,q42_stratified_sample,q46_weighted_sample,q49_mixture_sample,q50_pack,q58_asof_broadcast,q60_zscore,q61_corr,q68_inverted_index,q69_bloom_join,q71_unigram_logprob,q72_full_outer,q78_salted_join,q80_scd2,q85_lag_lead,q91_mode,q92_moments,q99_heavy_hitters,q102_top_supplier,q110_nation_profit,q115_bpe_pairs,q126_dot_topk,q133_l2_topk,q148_bpe_encode,q163_perplexity_buckets,q165_zipf_slope"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
  "runMain graft.Verify $SF $OUT $PRIOR,$NEW,$ROTATION"
python3 tools/correctness_10x.py "$SF" "$OUT" "$BUDGET"
