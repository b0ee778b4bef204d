"""Plan-shape + semantic assertions for the round-3 second-wave queries
(Q5 join, FILTER aggregates, JSON extraction, Gopher rules,
quantile_over_time, Bloom decontamination, interpolation gapfill, LTTB,
funnel, retention, NTILE, unigram surprisal): the scale claims in their
docstrings hold in the physical plans, and the operator semantics are
pinned by cross-operator invariants."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.plans.inspect import explain_str
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank.llm_ops import *  # noqa: F401,F403 - registers queries
from incubator_horaedb_spark.querybank.olap_ext import *  # noqa: F401,F403
from incubator_horaedb_spark.querybank.promql import *  # noqa: F401,F403
from incubator_horaedb_spark.querybank.timeseries import *  # noqa: F401,F403


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def _hash_exchanges(df) -> int:
    return len(re.findall(r"Exchange hashpartitioning", explain_str(df, "simple")))


def _broadcast_joins(df) -> int:
    return len(re.findall(r"BroadcastHashJoin", explain_str(df, "simple")))


def test_q5_dimensions_broadcast(spark, sf_dir, qs):
    # region/nation/supplier/customer all broadcast; the only hash
    # exchanges left are the fact-side join + final agg family
    df = qs["q5_local_supplier_volume"](spark, sf_dir)
    assert _broadcast_joins(df) >= 3, explain_str(df, "simple")
    assert _hash_exchanges(df) <= 3, explain_str(df, "simple")


def test_agg_filter_single_scan_single_agg(spark, sf_dir, qs):
    df = qs["agg_filter_clause"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert len(re.findall(r"Scan parquet|FileScan", text)) == 1, text
    assert _hash_exchanges(df) == 1, text
    # FILTER'd counts can never exceed the unfiltered count
    for r in df.collect():
        assert r["n_hi_disc"] <= r["n_all"] and r["n_small"] <= r["n_all"]


def test_json_extract_values(spark, sf_dir, qs):
    rows = qs["events_json_extract"](spark, sf_dir).collect()
    for r in rows:
        # every props payload carries $.k in the synthetic data
        assert r["n_with_k"] == r["n_events"]
        assert r["min_k"] <= r["max_k"]


def test_gopher_rules_no_shuffle(spark, sf_dir, qs):
    # pure map-side expression pipeline: zero exchanges
    df = qs["quality_gopher_rules"](spark, sf_dir)
    assert _hash_exchanges(df) == 0, explain_str(df, "simple")
    for r in df.take(50):
        assert r["keep"] == (
            r["ok_word_count"]
            and r["ok_mean_len"]
            and r["ok_alpha"]
            and r["ok_symbols"]
            and r["ok_stopwords"]
        )


def test_quantile_over_time_bounded_by_min_max(spark, sf_dir, qs):
    q = {
        (r["event_type"], r["ts"]): r["value"]
        for r in qs["promql_quantile_over_time"](spark, sf_dir).collect()
    }
    lo = {
        (r["event_type"], r["ts"]): r["value"]
        for r in qs["promql_min_over_time"](spark, sf_dir).collect()
    }
    hi = {
        (r["event_type"], r["ts"]): r["value"]
        for r in qs["promql_max_over_time"](spark, sf_dir).collect()
    }
    eps = 2**-19  # quantization slack (values quantized at 2^-20 + r6)
    assert q, "no aligned steps"
    for k, v in q.items():
        assert lo[k] - eps <= v <= hi[k] + eps, (k, lo[k], v, hi[k])


def test_bloom_superset_of_exact_decontamination(spark, sf_dir, qs):
    """No false negatives: every exact n-gram contamination hit appears in
    the Bloom result with at-least-equal overlap (Bloom adds only false
    positives, and both use the same shingles and threshold)."""
    exact = {r["doc_id"]: r for r in qs["decontaminate_ngram"](spark, sf_dir).collect()}
    bloom = {r["doc_id"]: r for r in qs["decontaminate_bloom"](spark, sf_dir).collect()}
    assert exact, "exact decontamination found nothing - test corpus changed?"
    for doc_id, r in exact.items():
        assert doc_id in bloom, doc_id
        assert bloom[doc_id]["n_maybe"] >= r["n_shared"]


def test_gapfill_interp_matches_locf_on_observed_buckets(spark, sf_dir, qs):
    interp = {
        (r["event_type"], r["bucket_ts"]): r
        for r in qs["time_bucket_gapfill_interp"](spark, sf_dir).collect()
    }
    locf = {
        (r["event_type"], r["bucket_ts"]): r
        for r in qs["time_bucket_gapfill_locf"](spark, sf_dir).collect()
    }
    assert set(interp) == set(locf)
    n_observed = 0
    for k, r in interp.items():
        if not r["gap_filled"]:
            n_observed += 1
            assert r["value"] == locf[k]["value"], k
    assert n_observed > 0


def test_lttb_selects_real_points(spark, sf_dir, qs):
    """Every LTTB output row is an actual sample of its bucket, one per
    non-empty (series, bucket)."""
    rows = qs["lttb_downsample"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        key = (r["event_type"], r["bucket_ts"])
        assert key not in seen, f"two points for bucket {key}"
        seen.add(key)
    ev = registry.load(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    n_buckets = (
        ev.select(
            "event_type",
            (F.floor(F.unix_millis("ts") / (15 * 60 * 1000))).alias("b"),
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_buckets


def test_funnel_monotone(spark, sf_dir, qs):
    r = qs["funnel_conversion"](spark, sf_dir).collect()[0]
    assert r["n_view"] >= r["n_view_click"] >= r["n_view_click_purchase"] >= 0
    assert r["n_view"] > 0


def test_retention_day0_equals_cohort_size(spark, sf_dir, qs):
    rows = qs["retention_cohorts"](spark, sf_dir).collect()
    day0 = {r["cohort_day"]: r["n_active"] for r in rows if r["offset_days"] == 0}
    for r in rows:
        # no offset can retain more users than the cohort had on day 0
        assert r["n_active"] <= day0[r["cohort_day"]]


def test_ntile_balanced_buckets(spark, sf_dir, qs):
    rows = qs["window_ntile_quartiles"](spark, sf_dir).collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r["n"])
    n_orders = registry.load(spark, sf_dir, "orders").count()
    assert sum(n for ns in by_status.values() for n in ns) == n_orders
    for status, ns in by_status.items():
        assert max(ns) - min(ns) <= 1, (status, ns)  # NTILE balance invariant


def test_surprisal_positive_and_total(spark, sf_dir, qs):
    rows = qs["text_unigram_surprisal"](spark, sf_dir).collect()
    docs = registry.load(spark, sf_dir, "documents")
    assert len(rows) == docs.count()  # synthetic corpus has no empty docs
    for r in rows:
        assert r["mean_surprisal"] > 0
        assert r["n_tokens"] > 0


def test_cms_one_sided_error(spark, sf_dir, qs):
    """Count-min estimates can only OVER-count (hash collisions add)."""
    rows = qs["cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"] > 0
