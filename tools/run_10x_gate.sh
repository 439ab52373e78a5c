#!/bin/bash
# Round-13 10x correctness gate (VERDICT r12 asks #2 and #7):
#   - heavy tail + prior gate rows (25)
#   - the four recall rows previously marked oracle_infeasible_at_10x
#     (measured feasible this round: the 10x recall oracle is a
#     20k-corpus x 200-query cross, ~tens of seconds in DuckDB — the
#     "1.2B-row" estimate was wrong)
#   - the round's new rows q197/q198
#   - a 22-row ROTATION across the cheap surface (families never
#     10x-hash-checked before; rotate each round per ask #7).
#     r13's rotation caught q24's one-ulp rounding divergence.
#     r14 candidates (still never 10x-checked): q02/q03/q06 envelope
#     plane, q10-q16 control plane, q30s window family, q50s TPC-H
#     shapes, q60s text stats, q90s retention/gini, q100s order
#     analytics, q129/q139/q140 scalar families, q16x sampling rows.
# Usage: bash tools/run_10x_gate.sh [budget_sec]
set -e
cd "$(dirname "$0")/.."
SF=/tmp/graft_10x_sf0.1_v4
OUT=/tmp/verify_10x_r13
BUDGET=${1:-1800}

PRIOR="q128_clean_corpus,q135_unpivot,q141_semdedup,q149_pagerank,q154_kmeans,q158_covariance,q170_curation_pipeline,q171_knn_join,q173_contrastive_pairs,q174_kn_bigram,q17_json_extract,q181_jl_project,q183_kmv_algebra,q188_two_level_dedup,q23_langid,q25_minhash,q28_near_dups,q34_embedding_neardups,q44_jaccard_dedup,q47_dedup_clusters,q55_rollup,q74_scalar_subquery,q84_multi_distinct,q194_probe_pair_cost,q195_two_level_dedup_np2"
RECALL="q191_two_level_recall_np1,q192_two_level_recall_np2,q193_two_level_recall_np4,q196_two_level_recall_wide"
NEW="q197_retrieval_operating_point,q198_retrieval_pair_cost"
ROTATION="q01_agg,q04_latest_row,q05_txn_sequence,q07_reconcile_anti,q09_tables_listing,q11_fingerprint,q21_dedup_exact,q24_quality,q26_simhash,q29_sessionize,q40_asof_join,q45_kmv_distinct,q53_local_supplier_volume,q56_pivot,q63_tfidf,q67_setops,q75_grouping_sets,q96_retention,q160_span_cut,q175_skew_report,q177_url_dedup,q186_incremental_sessions"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} sbt -batch \
  "runMain graft.Verify $SF $OUT $PRIOR,$RECALL,$NEW,$ROTATION"
python3 tools/correctness_10x.py "$SF" "$OUT" "$BUDGET"
