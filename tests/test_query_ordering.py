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
    # round-8 window (VERDICT r07 next-round #1): 38 of 50 slots are
    # never-driver-verified promotions — the full TPC-H q2-q22 tail, the
    # window-function families, multimodal audio/video, the subquery
    # families, the two remaining streaming-ingest gates, the r7 grammar
    # twins, CUBE/GROUPING SETS, the protocol rate variants, and
    # tsz_dod_compression.  12 anchors keep family spread.  Demoted
    # queries (all driver-green r07) stay gated in the full-bank sweeps.
    for rep in [
        # anchors
        "q1_pricing_summary", "scan_filter_project",
        "join_inner_3way", "time_bucket_minute", "dedup_latest_by_key",
        "time_range_scan", "promql_rate", "promql_instant",
        "dedup_minhash_lsh", "ann_cosine_bruteforce",
        "streaming_ingest_dedup_read",
        # never-driver-verified promotions (incl. the round-8-new
        # partitioned pruning read, which took topk_order_limit's slot)
        "partitioned_scan_prune",
        "q2_min_cost_supplier", "q3_shipping_priority", "q4_order_priority",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q10_returned_items", "q11_important_stock",
        "q12_priority_lines", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_counts",
        "q17_small_quantity", "q19_discounted_revenue",
        "q20_part_promotion", "q21_waiting_suppliers", "q22_global_sales",
        "window_rank_family", "window_value_family",
        "window_range_time_frame", "window_qualify_topn",
        "multimodal_audio_pcm_stats", "multimodal_video_frame_stats",
        "subquery_not_in_null_semantics", "subquery_exists_correlated",
        "subquery_scalar_agg",
        "streaming_ingest_evolve_read", "streaming_ingest_ttl_read",
        "promql_parsed_agg_stdvar", "promql_parsed_agg_group",
        "promql_parsed_sgn_delta",
        "cube_agg", "grouping_sets_explicit",
        "influxql_derivative", "opentsdb_rate_query",
        "tsz_dod_compression",
    ]:
        assert rep in first50, rep


def test_round8_window_is_majority_never_driver_verified():
    # the r8 rotation's whole point: >=30 slots had zero driver rows
    # through CORRECTNESS_r07 (VERDICT r07 next-round #1 acceptance)
    import json
    import pathlib

    seen: set[str] = set()
    for f in sorted(pathlib.Path("/root/repo").glob("CORRECTNESS_r0[1-7].json")):
        seen |= set(json.loads(f.read_text()).keys())
    if not seen:  # driver artifacts absent (fresh checkout) — vacuous
        return
    first50 = list(querybank.queries())[:50]
    never = [q for q in first50 if q not in seen]
    assert len(never) >= 30, (len(never), never)


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
