#!/bin/bash
# Round-14 10x correctness gate (VERDICT r13 ask #5: rotate again —
# the r13 rotation caught q24's one-ulp rounding divergence, assume
# the remaining never-10x-checked rows hide another):
#   - PRIOR: every row green in r13's gate (heavy tail + recall rows
#     + the r13 rotation) — 53 rows, kept green round-over-round
#   - NEW: this round's rows (q199 self-scaling SRP, q200 store-served
#     retrieval dial)
#   - ROTATION (r14): 24 rows never 10x-hash-checked before, drawn
#     from the families the r13 script noted as candidates — the
#     q02/q03/q06 envelope plane, q10-q15 control plane, q30s window
#     family, q35/q54 TPC-H shapes, q60s text stats, q90s
#     retention/entropy/gini, q100s order analytics, q129/q139/q140
#     scalar families, q146/q164 sampling rows.
#   r15 candidates (still never 10x-checked): q12/q16/q18-q20 envelope
#   tail, q36-q38 cdc/topk, q41-q43 joins, q46/q49/q50 sampling/pack,
#   q59-q61 stats, q65-q71 text/sketch, q76-q95 window/stat families,
#   q97-q99, q102-q114 TPC-H tail, q115-q124, q130-q138, q143-q153,
#   q161-q186 remainder.
# Usage: bash tools/run_10x_gate.sh [budget_sec]
set -e
cd "$(dirname "$0")/.."
SF=/tmp/graft_10x_sf0.1_v4
OUT=/tmp/verify_10x_r14
BUDGET=${1:-1800}

PRIOR="q128_clean_corpus,q135_unpivot,q141_semdedup,q149_pagerank,q154_kmeans,q158_covariance,q170_curation_pipeline,q171_knn_join,q173_contrastive_pairs,q174_kn_bigram,q17_json_extract,q181_jl_project,q183_kmv_algebra,q188_two_level_dedup,q23_langid,q25_minhash,q28_near_dups,q34_embedding_neardups,q44_jaccard_dedup,q47_dedup_clusters,q55_rollup,q74_scalar_subquery,q84_multi_distinct,q194_probe_pair_cost,q195_two_level_dedup_np2,q191_two_level_recall_np1,q192_two_level_recall_np2,q193_two_level_recall_np4,q196_two_level_recall_wide,q197_retrieval_operating_point,q198_retrieval_pair_cost,q01_agg,q04_latest_row,q05_txn_sequence,q07_reconcile_anti,q09_tables_listing,q11_fingerprint,q21_dedup_exact,q24_quality,q26_simhash,q29_sessionize,q40_asof_join,q45_kmv_distinct,q53_local_supplier_volume,q56_pivot,q63_tfidf,q67_setops,q75_grouping_sets,q96_retention,q160_span_cut,q175_skew_report,q177_url_dedup,q186_incremental_sessions"
NEW="q199_neardups_selfscaling,q200_store_retrieval_dial"
ROTATION="q02_keyset_page,q03_import_envelope,q06_insert_result,q10_backoff,q13_table_filter,q14_job_eligibility,q15_job_acquire,q31_tumbling_window,q37_grouped_topk,q39_percentiles,q43_rolling,q35_ship_priority,q54_returned_items,q62_vocab,q64_bm25,q66_histogram,q90_funnel,q93_entropy,q98_gini,q101_promo_revenue,q109_market_share,q129_date_features,q139_pii_scrub,q140_url_normalize,q146_group_sample,q164_token_budget"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
  "runMain graft.Verify $SF $OUT $PRIOR,$NEW,$ROTATION"
python3 tools/correctness_10x.py "$SF" "$OUT" "$BUDGET"
