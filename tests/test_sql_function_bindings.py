"""SQL-text bindings for custom functions — the function corpus shape
(integration_tests/cases/common/function/{time_bucket,date_bin,
thetasketch_distinct}.sql runs these in SQL statements)."""

from __future__ import annotations

import pytest

from incubator_horaedb_spark.frontends.sql_shim import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "store"))


@pytest.fixture()
def t(engine):
    engine.execute_sql(
        "CREATE TABLE fx (name string TAG, value double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic WITH(enable_ttl='false')"
    )
    engine.execute_sql(
        "INSERT INTO fx (name, value, t) VALUES "
        "('a', 1, 1651737067000), ('a', 2, 1651737068000), "
        "('b', 3, 1651737127000), ('b', 4, 1651737187000)"
    )
    return engine


def test_time_bucket_in_sql(t):
    # function/time_bucket.sql shape: group by time_bucket(t, 'PT1M')
    df = t.execute_sql(
        "SELECT time_bucket(t, 'PT1M') AS bucket, count(*) AS n "
        "FROM fx GROUP BY time_bucket(t, 'PT1M') ORDER BY bucket"
    )
    rows = [(r["bucket"].isoformat(), r["n"]) for r in df.collect()]
    assert rows == [
        ("2022-05-05T07:51:00", 2),
        ("2022-05-05T07:52:00", 1),
        ("2022-05-05T07:53:00", 1),
    ]


def test_time_bucket_sql_matches_column_impl(t, spark):
    # the Python SQL binding and the native Column expression must agree
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.time_bucket import time_bucket

    via_sql = t.execute_sql("SELECT t, time_bucket(t, 'P1D') AS b FROM fx")
    via_col = via_sql.select("t", time_bucket("t", "P1D").alias("b2"))
    assert via_col.filter(F.col("b") != F.col("b2")).count() == 0


def test_date_bin_in_sql(t):
    df = t.execute_sql(
        "SELECT date_bin(60000, t, 0) AS bin, count(*) AS n "
        "FROM fx GROUP BY date_bin(60000, t, 0) ORDER BY bin"
    )
    assert [r["n"] for r in df.collect()] == [2, 1, 1]


def test_thetasketch_distinct_in_sql(t):
    # rewritten to approx_count_distinct(x, 0.008); exact at tiny NDV
    df = t.execute_sql(
        "SELECT name, thetasketch_distinct(value) AS ndv FROM fx GROUP BY name ORDER BY name"
    )
    assert [(r["name"], r["ndv"]) for r in df.collect()] == [("a", 2), ("b", 2)]


def test_rewrite_is_balanced():
    from incubator_horaedb_spark.functions.sql_bindings import rewrite_sql_functions

    s = rewrite_sql_functions(
        "SELECT thetasketch_distinct(coalesce(a, (b))) FROM x WHERE f(thetasketch_distinct(c))"
    )
    assert s == (
        "SELECT approx_count_distinct(coalesce(a, (b)), 0.008) FROM x "
        "WHERE f(approx_count_distinct(c, 0.008))"
    )
