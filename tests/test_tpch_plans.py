"""Plan-shape + semantic assertions for the TPC-H completion queries
(querybank/tpch.py): the scale claims in their docstrings hold in the
physical plans, and the adapted semantics are pinned by invariants."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.plans.inspect import explain_str, pushed_filters
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank.tpch import *  # noqa: F401,F403 - registers queries


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def _plan(df) -> str:
    return explain_str(df, "simple")


def test_q4_exists_is_semi_join(spark, sf_dir, qs):
    df = qs["q4_order_priority"](spark, sf_dir)
    text = _plan(df)
    assert "LeftSemi" in text, text
    # the quarter predicate reaches the orders scan as a PushedFilter
    pf = " ".join(pushed_filters(df))
    assert "o_orderdate" in pf, pf
    rows = qs["q4_order_priority"](spark, sf_dir).collect()
    assert all(r["order_count"] > 0 for r in rows)


def test_q16_not_in_is_anti_join(spark, sf_dir, qs):
    text = _plan(qs["q16_supplier_counts"](spark, sf_dir))
    assert "LeftAnti" in text, text
    assert "Expand" in text or "distinct" in text.lower(), text


def test_q21_has_semi_and_anti(spark, sf_dir, qs):
    text = _plan(qs["q21_waiting_suppliers"](spark, sf_dir))
    assert "LeftSemi" in text and "LeftAnti" in text, text
    assert "TakeOrderedAndProject" in text, text


def test_q17_decorrelates_to_single_part_aggregate(spark, sf_dir, qs):
    # Catalyst must NOT evaluate the two correlated scalar subqueries
    # per-row: they decorrelate into per-part aggregates joined back.
    text = _plan(qs["q17_small_quantity"](spark, sf_dir))
    assert "Subquery" not in text, text  # no uncollapsed per-row subquery
    assert len(re.findall(r"HashAggregate", text)) >= 2, text


def test_q19_disjunction_prunes_part_before_join(spark, sf_dir, qs):
    # the brand/size/type OR-branches must filter part BELOW the join
    text = _plan(qs["q19_discounted_revenue"](spark, sf_dir))
    m = re.search(r"Filter.*Brand#1.*Brand#2.*Brand#3", text)
    assert m, text


def test_q13_left_outer_keeps_zero_order_customers(spark, sf_dir, qs):
    rows = {r["c_count"]: r["custdist"] for r in qs["q13_customer_distribution"](spark, sf_dir).collect()}
    # distribution counts each customer exactly once
    total = sum(rows.values())
    n_cust = registry.load(spark, sf_dir, "customer").count()
    assert total == n_cust


def test_q15_ties_all_kept(spark, sf_dir, qs):
    rows = qs["q15_top_supplier"](spark, sf_dir).collect()
    assert len({r["total_cents"] for r in rows}) == 1  # all at the max


def test_q8_share_in_unit_interval(spark, sf_dir, qs):
    for r in qs["q8_market_share"](spark, sf_dir).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_q2_cost_is_regional_minimum(spark, sf_dir, qs):
    rows = qs["q2_min_cost_supplier"](spark, sf_dir).collect()
    # every reported (part, cost) is the min for that part among the rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["cost_cents"])
    assert all(len(costs) == 1 for costs in by_part.values())
