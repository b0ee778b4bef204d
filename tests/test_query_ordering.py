"""The driver's correctness gate may cap how many queries() entries it
checks (round 1: 50 of 73).  DRIVER_ORDER front-loads one representative
per operator family so a capped run still covers every family."""

from __future__ import annotations

from incubator_horaedb_spark import querybank
from incubator_horaedb_spark.querybank.registry import DRIVER_ORDER


def test_driver_order_is_front_of_queries():
    names = list(querybank.queries())
    assert names[: len(DRIVER_ORDER)] == DRIVER_ORDER
    # no entry lost or duplicated by the reordering
    assert sorted(names) == sorted(querybank.QUERIES)
    assert len(set(names)) == len(names)


def test_driver_order_covers_families_in_first_50():
    first50 = set(list(querybank.queries())[:50])
    # one representative per graded family must sit in the first 50
    for rep in [
        "join_inner_3way", "window_rownum_top2", "rollup_agg",
        "udaf_energy_by_type", "percentile_exact", "time_bucket_minute",
        "dedup_latest_by_key", "time_range_scan", "promql_rate",
        "promql_instant", "opentsdb_downsample_groupby",
        "influxql_groupby_time_tag", "dedup_minhash_lsh",
        "ann_cosine_bruteforce", "ivf_kmeans_train",
        "ann_topk_blocked", "text_fingerprint",
        "multimodal_png_pixel_stats", "funnel_conversion",
        # round-4/5 rotation survivors
        "join_full_outer", "q18_large_orders", "pack_sequences",
        "dedup_dupspan_report", "session_window_agg",
        # round-6 rotations IN (VERDICT r05 next-round #2): ten never-
        # driver-verified representatives — round-5 families plus the
        # round-6 parser-evaluator layer
        "bpe_train_merges", "multimodal_jpeg_pixel_stats",
        "decontaminate_winnow", "market_basket_pairs", "dau_wau_stickiness",
        "lateral_topk_per_key", "promql_parsed_share",
        "promql_parsed_subquery", "promql_parsed_histogram_quantile",
        "promql_parsed_topk_sum",
        # round-6 mid-round rotations IN: the round's own new families —
        # H.264 decode, parsed set ops, scalar() arithmetic, @ modifier,
        # and two code-review regression locks
        "multimodal_h264_iframe_stats", "promql_parsed_or",
        "promql_parsed_scalar_of", "promql_parsed_at",
        "promql_parsed_precedence", "promql_parsed_absent_bool",
        # rotated out in r6 (families keep reps above, all driver-green
        # r05): promql_subquery_max_rate, dedup_edit_distance,
        # dedup_containment, influxql_selectors, nearest_join_events,
        # embedding_power_iteration, text_tfidf_topk, events_json_extract,
        # q5_local_supplier_volume, pivot_event_counts; mid-round:
        # subquery_in, chain_append_read, promql_group_left,
        # decontaminate_ngram, embedding_rhp_lsh, text_langid
    ]:
        assert rep in first50, rep


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
