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
    # round-9 window (VERDICT r08 next-round #1/#8): 39 of 50 slots are
    # never-driver-verified promotions — the two new protocol-write e2e
    # gates, the r8 block-diagonal twins, the entity rankings freshly
    # moved to the two-pass rank, the olap_ext block, the full ANN index
    # lifecycle, ten timeseries analyses, cohort/profile reports,
    # embedding curation, dedup calibration, and the text-quality block.
    # 11 anchors keep family spread.  Demoted queries (all driver-green
    # r08) stay gated in the full-bank sweeps.
    for rep in [
        # anchors
        "q1_pricing_summary", "scan_filter_project",
        "join_inner_3way", "time_bucket_minute", "dedup_latest_by_key",
        "time_range_scan", "promql_rate", "promql_instant",
        "dedup_minhash_lsh", "ann_cosine_bruteforce",
        "streaming_ingest_dedup_read",
        # never-driver-verified promotions (r9)
        "influx_write_ingest_read", "opentsdb_put_ingest_read",
        "dedup_ngram_jaccard_blocked", "embedding_near_dup_blockdiag",
        "pareto_customers", "rfm_segmentation",
        "user_activity_percentiles", "event_path_topk",
        "percentile_disc_group", "string_agg_ordered", "unpivot_metrics",
        "window_ntile_quartiles",
        "pq_train", "ann_pq_adc", "ann_ivfpq", "ann_refine_rerank",
        "ivf_medoids", "ann_recall_at_k", "ann_mips_topk",
        "ts_gap_report", "changepoint_cusum", "ts_autocorrelation",
        "ts_cross_correlation", "ts_correlation_matrix", "anomaly_zscore",
        "anomaly_mad", "m4_downsample", "lttb_downsample",
        "time_weighted_avg", "seasonal_profile", "event_transition_matrix",
        "retention_cohorts",
        "embedding_semdedup", "embedding_int8_quantize",
        "dedup_threshold_sweep", "dedup_minhash_accuracy",
        "text_winnow_fingerprint", "text_unigram_surprisal",
        "quality_gopher_rules",
    ]:
        assert rep in first50, rep


def test_round9_window_is_majority_never_driver_verified():
    # the rotation's whole point: >=35 slots had zero driver rows
    # through CORRECTNESS_r08 (VERDICT r08 next-round #1 acceptance)
    import json
    import pathlib

    seen: set[str] = set()
    for f in sorted(pathlib.Path("/root/repo").glob("CORRECTNESS_r0[1-8].json")):
        seen |= set(json.loads(f.read_text()).keys())
    if not seen:  # driver artifacts absent (fresh checkout) — vacuous
        return
    first50 = list(querybank.queries())[:50]
    never = [q for q in first50 if q not in seen]
    assert len(never) >= 35, (len(never), never)


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
