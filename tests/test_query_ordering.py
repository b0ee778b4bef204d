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
    # round-10 window (VERDICT r09 next-round #1): 40 of 50 slots are
    # never-driver-verified promotions — the new wire bulk-load gate, the
    # Prometheus remote-write gate, the full promql_parsed_* twin block,
    # the direct *_over_time family, the multimodal header-meta trio, the
    # set-op ALL variants, the corpus-report block, the skew-guarded
    # distinct and the statistical aggregates.  10 anchors keep family
    # spread.  Demoted queries (all driver-green r09 or earlier) stay
    # gated in the full-bank sweeps.
    for rep in [
        # anchors
        "q1_pricing_summary", "scan_filter_project",
        "join_inner_3way", "time_bucket_minute", "dedup_latest_by_key",
        "time_range_scan", "promql_rate",
        "dedup_minhash_lsh", "ann_cosine_bruteforce",
        "streaming_ingest_dedup_read",
        # never-driver-verified promotions (r10)
        "copy_load_ingest_read", "prom_write_ingest_read",
        "promql_parsed_sum", "promql_parsed_sum_without",
        "promql_parsed_count", "promql_parsed_max",
        "promql_parsed_topk", "promql_parsed_bottomk", "promql_parsed_clamp",
        "promql_parsed_offset", "promql_parsed_instant",
        "promql_parsed_avg_over_time", "promql_parsed_deriv",
        "promql_parsed_changes", "promql_parsed_absent",
        "promql_parsed_abs_delta", "promql_parsed_ln_rate",
        "promql_parsed_threshold_bool", "promql_parsed_threshold_filter",
        "promql_parsed_and", "promql_parsed_unless",
        "promql_parsed_scalar_mult", "promql_parsed_time_minus",
        "promql_parsed_ratio",
        "promql_avg_over_time", "promql_quantile_over_time",
        "promql_stddev_over_time", "promql_stdvar_over_time",
        "promql_absent_over_time",
        "multimodal_image_header_meta", "multimodal_audio_header_meta",
        "multimodal_video_header_meta",
        "set_intersect_all", "set_except_all",
        "corpus_mix_report", "corpus_split_assign", "drift_psi_report",
        "corpus_curation_e2e",
        "salted_distinct_users", "stats_corr_regr",
    ]:
        assert rep in first50, rep


def test_round10_window_is_majority_never_driver_verified():
    # the rotation's whole point: >=39 slots had zero driver rows
    # through CORRECTNESS_r09 (VERDICT r09 next-round #1 acceptance)
    import json
    import pathlib

    seen: set[str] = set()
    for f in sorted(pathlib.Path("/root/repo").glob("CORRECTNESS_r0[1-9].json")):
        seen |= set(json.loads(f.read_text()).keys())
    if not seen:  # driver artifacts absent (fresh checkout) — vacuous
        return
    first50 = list(querybank.queries())[:50]
    never = [q for q in first50 if q not in seen]
    assert len(never) >= 39, (len(never), never)


def test_oracles_follow_query_order():
    qnames = [n for n in querybank.queries() if n in querybank.oracles()]
    assert list(querybank.oracles()) == qnames
