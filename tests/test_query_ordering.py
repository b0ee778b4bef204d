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
        "influxql_groupby_time_tag", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_cluster_reps",
        "ann_cosine_bruteforce", "ivf_kmeans_train",
        "ann_ivf_trained", "ann_topk_blocked", "embedding_rhp_lsh",
        "text_langid", "text_quality", "text_fingerprint",
        "multimodal_png_pixel_stats", "funnel_conversion",
        # round-4 rotations IN: the four formerly-latent HUGEINT oracles
        # plus first reps of the TPC-H-completion and PromQL-evaluator
        # families (never driver-verified before)
        "pivot_event_counts", "agg_filter_clause", "events_json_extract",
        "join_full_outer", "promql_histogram_quantile", "promql_topk_series",
        "q5_local_supplier_volume", "q18_large_orders",
        # rotated out in r3/r4 (families keep reps above): ann_cosine_ivf,
        # multimodal_decode_meta, dedup_ngram_jaccard, dedup_apply_survivors,
        # holt_winters_smooth, text_token_count, text_bm25_topk,
        # text_repetition, pii_scrub, cms_heavy_hitters
    ]:
        assert rep in first50, rep


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
