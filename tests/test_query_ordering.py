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
        # round-4/5/6 rotation survivors
        "join_full_outer", "q18_large_orders", "pack_sequences",
        "multimodal_h264_iframe_stats",
        # round-7 rotations IN (VERDICT r06 next-round #1): seventeen
        # never-driver-verified representatives — round-6 parser families
        # with zero driver rows, long-unverified round-5 families, the
        # round-7 grammar-completion twins, and the end-to-end
        # streaming-ingest gate
        "promql_parsed_group_right", "promql_parsed_cmp_over_binop",
        "promql_parsed_or_vector", "promql_parsed_count_values",
        "promql_parsed_label_replace", "promql_parsed_predict_linear",
        "promql_parsed_quantile_over_time",
        "dedup_graph_pagerank", "tsz_xor_compression", "hybrid_rrf_fusion",
        "ts_seasonal_decompose",
        "promql_parsed_holt_winters", "promql_parsed_agg_quantile",
        "promql_parsed_agg_stddev", "promql_parsed_sort_desc",
        "promql_parsed_calendar_hour",
        "streaming_ingest_dedup_read",
        # rotated out in r7 (families keep reps above, all driver-green
        # r06): promql_parsed_{share, subquery, histogram_quantile,
        # topk_sum, or, scalar_of, at, precedence, absent_bool},
        # bpe_train_merges, multimodal_jpeg_pixel_stats,
        # decontaminate_winnow, market_basket_pairs, dau_wau_stickiness,
        # lateral_topk_per_key, session_window_agg, dedup_dupspan_report
    ]:
        assert rep in first50, rep


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
