"""Physical-plan shape assertions for the round-4 operators — the scale
claims in the operator docstrings, checked against the actual plans
(SURVEY §7.5 property-testing style, same as test_tpch_plans)."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.plans.inspect import (
    explain_str,
    has_partial_and_final_agg,
)
from incubator_horaedb_spark.querybank import registry


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def test_nearest_join_has_no_range_join(spark, sf_dir, qs):
    df = qs["nearest_join_events"](spark, sf_dir)
    text = explain_str(df, "simple")
    # the two-frame window composition must not plan a range/cartesian join
    assert "CartesianProduct" not in text, text
    assert "Window" in text, text


def test_seasonal_profile_is_single_scan_agg(spark, sf_dir, qs):
    df = qs["seasonal_profile"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert "Join" not in text and "Window" not in text, text
    assert has_partial_and_final_agg(df), text


def test_binary_vector_ops_joins_on_grid_not_samples(spark, sf_dir, qs):
    df = qs["promql_binary_vector_ops"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text, text
    # both sides come from one aligned evaluation; the ts equi-join exists
    assert "Join" in text, text


def test_dod_compression_plan_is_two_windows_one_agg(spark, sf_dir, qs):
    df = qs["tsz_dod_compression"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both lag windows share the event_type partitioning: at most one
    # exchange for the windows plus the final (tiny) aggregate exchange
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 2, plan


def test_budget_select_single_window_per_source(spark, sf_dir, qs):
    df = qs["corpus_budget_select"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert "Join" not in text, text
    assert "Window" in text, text


def test_tfidf_df_join_is_not_cartesian(spark, sf_dir, qs):
    df = qs["text_tfidf_topk"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text, text
    assert "TakeOrderedAndProject" in text or "Window" in text, text


def test_power_iteration_broadcasts_the_vector(spark, sf_dir, qs):
    df = qs["embedding_power_iteration"](spark, sf_dir)
    text = explain_str(df, "simple")
    # the 1-row vector side joins by broadcast (never a shuffled cross)
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text, text
