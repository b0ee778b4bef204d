"""Physical-plan shape assertions for the round-5 operators — the scale
claims in the operator docstrings, checked against the actual plans
(SURVEY §7.5 property-testing style, same as test_round4_plans)."""

from __future__ import annotations

import pytest

from incubator_horaedb_spark.plans.inspect import explain_str
from incubator_horaedb_spark.querybank import registry


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def test_dupspan_no_cartesian(spark, sf_dir, qs):
    text = explain_str(qs["dedup_dupspan_report"](spark, sf_dir), "simple")
    # candidate generation is a gram-keyed equi-join + one doc-keyed
    # window — never an all-pairs product
    assert "CartesianProduct" not in text, text
    assert "Window" in text, text


def test_rrf_fusion_no_cartesian_besides_stats(spark, sf_dir, qs):
    text = explain_str(qs["hybrid_rrf_fusion"](spark, sf_dir), "simple")
    # the only products are the 1-row stats/query broadcasts (BM25 corpus
    # stats, the single dense query vector); the fusion join is keyed
    assert text.count("CartesianProduct") == 0, text


def test_session_window_single_exchange_no_window_pass(spark, sf_dir, qs):
    df = qs["session_window_agg"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # native session windows: in-agg merging, no analytic Window operator
    assert "SessionWindowStateStore" in plan or "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_xcorr_single_raw_scan_agg(spark, sf_dir, qs):
    text = explain_str(qs["ts_cross_correlation"](spark, sf_dir), "simple")
    # one bucketing agg feeds both sides; the lag list is a tiny union
    assert "CartesianProduct" not in text or "BroadcastNestedLoopJoin" in text, text


def test_psi_two_stage_agg_no_join_blowup(spark, sf_dir, qs):
    text = explain_str(qs["drift_psi_report"](spark, sf_dir), "simple")
    # map-side bin ids -> (metric, bin) agg -> per-metric totals join:
    # the only join input is |bins| rows
    assert "CartesianProduct" not in text, text


def test_refine_rerank_candidate_bounded(spark, sf_dir, qs):
    rows = qs["ann_refine_rerank"](spark, sf_dir)
    text = explain_str(rows, "simple")
    assert "CartesianProduct" not in text, text


def test_unpivot_is_projection_expand(spark, sf_dir, qs):
    text = explain_str(qs["unpivot_metrics"](spark, sf_dir), "simple")
    # unpivot compiles to Expand/Generate over the agg output — no join
    assert "Join" not in text, text


def test_exif_single_scan_no_shuffle(spark, sf_dir, qs):
    df = qs["multimodal_exif_meta"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rrf_ranks_after_distributed_topk(spark, sf_dir, qs):
    df = qs["hybrid_rrf_fusion"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every ranking window must sit ABOVE a TakeOrderedAndProject — a bare
    # global row_number would single-partition the scored corpus
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_bm25_ranks_after_distributed_topk(spark, sf_dir, qs):
    df = qs["text_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
