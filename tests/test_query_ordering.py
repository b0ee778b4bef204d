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
        "join_inner_3way", "subquery_in", "window_rownum_top2", "rollup_agg",
        "udaf_energy_by_type", "percentile_exact", "time_bucket_minute",
        "dedup_latest_by_key", "time_range_scan", "promql_rate",
        "promql_instant", "opentsdb_downsample_groupby",
        "influxql_groupby_time_tag", "dedup_minhash_lsh",
        "ann_cosine_bruteforce", "ivf_kmeans_train",
        "ann_topk_blocked", "embedding_rhp_lsh",
        "text_langid", "text_fingerprint",
        "multimodal_png_pixel_stats", "funnel_conversion",
        # round-4 rotation survivors (TPC-H completion + PromQL evaluator
        # family reps)
        "pivot_event_counts", "events_json_extract",
        "join_full_outer",
        "q5_local_supplier_volume", "q18_large_orders",
        # round-5 rotations IN: one never-driver-verified representative
        # per round-4 family (VERDICT r04 next-round #1)
        "dedup_edit_distance", "dedup_containment", "nearest_join_events",
        "promql_subquery_max_rate", "influxql_selectors", "text_tfidf_topk",
        "pack_sequences", "embedding_power_iteration",
        # round-5 session swap IN: never-driver-verified round-5 families
        "promql_group_left", "dedup_dupspan_report", "session_window_agg",
        # rotated out in r5 (families keep reps above): dedup_simhash,
        # dedup_cluster_reps, interval_join_sessions, promql_topk_series,
        # text_quality, zorder_cluster, ann_ivf_trained, agg_filter_clause;
        # session swap out: dedup_exact (minhash/edit/containment cover the
        # family), sessionize_events (native session_window_agg covers),
        # promql_histogram_quantile (promql_subquery_max_rate covers)
    ]:
        assert rep in first50, rep


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
