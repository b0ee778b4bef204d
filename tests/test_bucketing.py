"""Bucketed co-located joins (operators/bucketing.py): both sides written
bucketBy the join key → the join plan has no shuffle exchange, and results
match the plain shuffled join.
"""

from __future__ import annotations

import pytest

from incubator_horaedb_spark.operators.bucketing import (
    cobucketed_join,
    join_is_shuffle_free,
    write_bucketed,
)
from incubator_horaedb_spark.querybank.registry import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_is_shuffle_free(spark, bucketed_tables):
    joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    joined.collect()
    assert join_is_shuffle_free(joined), joined._jdf.queryExecution().executedPlan().toString()


def test_plain_join_does_shuffle(spark, sf_dir):
    # control: the same join over unbucketed scans shuffles (so the
    # assertion above is meaningful, not vacuous)
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    # disable broadcast so the comparison is shuffle-join vs bucket-join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(lineitem, "o_orderkey")
        joined.collect()
        assert not join_is_shuffle_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_matches_shuffled(spark, sf_dir, bucketed_tables):
    got = sorted(
        (r["o_orderkey"], r["l_quantity"])
        for r in cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        .select("o_orderkey", "l_quantity")
        .collect()
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = load(spark, sf_dir, "lineitem")
    want = sorted(
        (r["l_orderkey"], r["l_quantity"])
        for r in lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_quantity")
        .collect()
    )
    assert got == want
