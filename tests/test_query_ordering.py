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
    # round-11 window (VERDICT r10 next-round #1): 40 of 50 slots are
    # never-driver-verified promotions — the five round-10 features, the
    # NEW binary-wire and snapshot-across-compaction gates, the r11
    # InfluxQL transform tail, the 17-query direct promql_* evaluator
    # family, the window families, and the text/embedding/multimodal
    # audits.  10 anchors keep family spread.  Demoted queries (all
    # driver-green r10 or earlier) stay gated in the full-bank sweeps.
    for rep in [
        # anchors
        "q1_pricing_summary", "scan_filter_project",
        "join_inner_3way", "time_bucket_minute", "dedup_latest_by_key",
        "time_range_scan", "promql_rate",
        "dedup_minhash_lsh", "ann_cosine_bruteforce",
        "streaming_ingest_dedup_read",
        # never-driver-verified promotions (r11)
        "ts_rollup_ladder", "hll_rollup_merge", "snapshot_read_as_of",
        "snapshot_compacted_read", "dedup_incremental_lsh",
        "influxql_non_negative_derivative", "influxql_moving_average",
        "wire_binary_roundtrip",
        "influxql_difference", "influxql_cumulative_sum", "influxql_elapsed",
        "influxql_percentile", "influxql_top", "influxql_bottom",
        "influxql_multi_transform",
        "promql_clamp", "promql_label_replace", "promql_count_values",
        "promql_deriv", "promql_predict_linear", "promql_changes",
        "promql_resets", "promql_count_over_time", "promql_sum_over_time",
        "promql_min_over_time", "promql_max_over_time",
        "promql_last_over_time", "promql_agg_quantile",
        "promql_binary_vector_ops", "promql_bottomk_series",
        "promql_rate_offset", "promql_wow_delta",
        "window_lag_delta", "window_moving_avg",
        "window_distribution_family",
        "text_bigram_surprisal", "embedding_norm_audit",
        "embedding_mrl_truncation", "multimodal_exif_meta",
        "time_bucket_gapfill_locf",
    ]:
        assert rep in first50, rep


def test_round11_window_is_majority_never_driver_verified():
    # the rotation's whole point: >=40 slots had zero driver rows
    # through CORRECTNESS_r10 (VERDICT r10 next-round #1 acceptance)
    import json
    import pathlib

    seen: set[str] = set()
    for f in sorted(pathlib.Path("/root/repo").glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(f.read_text()).keys())
    if not seen:  # driver artifacts absent (fresh checkout) — vacuous
        return
    first50 = list(querybank.queries())[:50]
    never = [q for q in first50 if q not in seen]
    assert len(never) >= 40, (len(never), never)


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
