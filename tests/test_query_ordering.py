"""The driver's correctness gate may cap how many queries() entries it
checks (round 1: 50 of 73).  DRIVER_ORDER front-loads one representative
per operator family so a capped run still covers every family."""

from __future__ import annotations

from incubator_horaedb_spark import querybank
from incubator_horaedb_spark.querybank.registry import DRIVER_ORDER

# The r12 window's 46 debt-clearing slots (the complete never-hash-green
# set computed from CORRECTNESS_r1..r11 plus this round's new composed
# gate).  PINNED AS A LITERAL — VERDICT r11 #1: the r11 version of this
# test globbed ALL CORRECTNESS_r*.json files, so it self-invalidated the
# moment the driver wrote the round's own artifact.  The never-seen claim
# is a statement about rounds 1-11 only and must stay one.
R12_PROMOTIONS = [
    "influxql_transform_over_fill", "sketch_rollup_persisted",
    "hll_rollup_merge", "thetasketch_distinct_users", "approx_percentile_price",
    "time_bucket_gapfill_interp", "hist_quantile_rollup", "time_to_conversion",
    "influxql_fill_linear", "influxql_show_tag_values", "opentsdb_filter_types",
    "copy_binary_ingest_read",
    "order_nulls_explicit", "join_cross_small", "set_union_distinct",
    "numeric_histogram", "column_profile",
    "text_ttr", "text_ngram_topk", "text_rare_token_ratio", "text_hash_features",
    "text_langid_confusion", "quality_classifier_score",
    "bpe_pair_counts", "bpe_encode_corpus",
    "dedup_paragraphs", "dedup_edit_survivors", "dedup_degree_histogram",
    "dedup_cross_source", "dedup_inflation_report",
    "decontaminate_bloom", "sample_weighted_mix", "sample_topk_per_group",
    "split_leakage_check", "corpus_budget_select", "corpus_source_divergence",
    "corpus_embedding_integrity",
    "doc_cluster_assign", "doc_cluster_quality", "embedding_abtt_postprocess",
    "embedding_distance_histogram", "embedding_near_dup_blocked",
    "ann_topk_multiblock",
    "multimodal_png_resize_stats", "multimodal_frame_sample",
    "multimodal_resize_meta", "multimodal_audio_windows",
]

R12_ANCHORS = [
    "q1_pricing_summary", "scan_filter_project", "join_inner_3way",
]


def test_driver_order_is_front_of_queries():
    names = list(querybank.queries())
    assert names[: len(DRIVER_ORDER)] == DRIVER_ORDER
    # no entry lost or duplicated by the reordering
    assert sorted(names) == sorted(querybank.QUERIES)
    assert len(set(names)) == len(names)


def test_round12_window_clears_all_driver_debt():
    # VERDICT r11 #2: the first 50 slots must be exactly the 3 anchors +
    # the complete 45-query never-hash-green backlog + the two r12-new
    # gates, so a green CORRECTNESS_r12.json makes cumulative
    # driver-verified == bank size.
    first50 = list(querybank.queries())[:50]
    assert set(first50) == set(R12_ANCHORS) | set(R12_PROMOTIONS)
    assert len(first50) == 50


def test_r12_promotions_never_hash_green_through_r11():
    # the rotation's whole point: every promoted slot (minus the new
    # r12-only gate) had zero hash-green driver rows through round 11.
    # Globs ONLY rounds 1-11 — the claim is historical and must not be
    # re-evaluated against this or future rounds' driver artifacts
    # (VERDICT r11 #1: the r11 test self-invalidated by globbing all).
    import json
    import pathlib
    import re

    green: set[str] = set()
    pat = re.compile(r"CORRECTNESS_r(0[1-9]|1[01])\.json$")
    for f in sorted(pathlib.Path("/root/repo").glob("CORRECTNESS_r*.json")):
        if not pat.search(f.name):
            continue
        for name, row in json.loads(f.read_text()).items():
            if row.get("hash_match") is True:
                green.add(name)
    if not green:  # driver artifacts absent (fresh checkout) — vacuous
        return
    promoted_old = [
        q for q in R12_PROMOTIONS
        if q not in ("influxql_transform_over_fill", "sketch_rollup_persisted")
    ]
    leaked = [q for q in promoted_old if q in green]
    assert not leaked, leaked
    # and the debt is COMPLETE: nothing in the bank outside the window is
    # still never-green (through r11)
    bank = set(querybank.queries())
    never = {q for q in bank if q not in green}
    outside = never - set(R12_PROMOTIONS) - set(R12_ANCHORS)
    assert not outside, outside


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
