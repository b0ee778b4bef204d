"""Two-pass global ranking (operators/rank2pass.py, VERDICT r08 #5):
bit-parity with the single-task window for row_number / running sums /
NTILE, across partition counts and skewed inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_horaedb_spark.operators.rank2pass import (
    attach_global_order,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def toy(spark):
    # skewed values with ties; key column breaks them (total order)
    rows = [(i, (i * 7919) % 13, float((i * 31) % 97)) for i in range(500)]
    return spark.createDataFrame(rows, "k bigint, grp bigint, v double")


def _window_expected(df, order_cols, running=None):
    w = Window.orderBy(*order_cols)
    out = df.withColumn("rnk", F.row_number().over(w).cast("long"))
    if running:
        wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        for name, src in running.items():
            out = out.withColumn(name, F.sum(src).over(wr))
    return out


def test_rank_matches_single_window(toy):
    order = [F.col("grp").asc(), F.col("k").asc()]
    got, totals = attach_global_order(toy, order, rank_name="rnk")
    exp = _window_expected(toy, order)
    assert totals["n"] == 500
    assert sorted(got.select("k", "rnk").collect()) == sorted(
        exp.select("k", "rnk").collect()
    )


def test_rank_desc_with_running_sum(toy):
    order = [F.col("v").desc(), F.col("k").asc()]
    got, totals = attach_global_order(
        toy, order, rank_name="rnk", running_sums={"run_v": "v"}
    )
    exp = _window_expected(toy, order, running={"run_v": "v"})
    assert sorted(got.select("k", "rnk", "run_v").collect()) == sorted(
        exp.select("k", "rnk", "run_v").collect()
    )
    # the grand total is the free byproduct callers rely on
    assert totals["run_v"] == sum(r.v for r in toy.collect())


def test_running_sum_long_stays_long(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(40)], "k bigint, c bigint")
    got, totals = attach_global_order(
        df, [F.col("k").asc()], running_sums={"run_c": "c"}
    )
    assert dict(got.dtypes)["run_c"] == "bigint"
    assert totals["run_c"] == sum(i * 10 for i in range(40))
    top = got.filter(F.col("k") == 39).collect()[0]
    assert top.run_c == totals["run_c"]


@pytest.mark.parametrize("n,tiles", [(500, 4), (10, 4), (3, 4), (7, 3), (4, 4)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, tiles):
    df = spark.createDataFrame([(i,) for i in range(n)], "k bigint")
    w = Window.orderBy("k")
    exp = df.withColumn("t", F.ntile(tiles).over(w).cast("long"))
    got, totals = attach_global_order(df, [F.col("k").asc()], rank_name="r")
    got = got.withColumn("t", ntile_from_rank(F.col("r"), totals["n"], tiles))
    assert sorted(got.select("k", "t").collect()) == sorted(
        exp.select("k", "t").collect()
    )


def test_partition_count_invariance(toy):
    order = [F.col("v").asc(), F.col("k").asc()]
    a, _ = attach_global_order(toy, order, num_partitions=3)
    b, _ = attach_global_order(toy, order, num_partitions=17)
    assert sorted(a.select("k", "rnk").collect()) == sorted(
        b.select("k", "rnk").collect()
    )


def test_no_global_window_in_plan(toy):
    got, _ = attach_global_order(toy, [F.col("k").asc()])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # every Window node must carry a partition spec (the __pid hash) —
    # the single-task 'No Partition Defined' shape must not appear
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__pid" in line

def test_multi_order_matches_three_single_windows(toy):
    """attach_global_orders (r10, VERDICT r09 wrong #2): three
    independent global ranks off ONE pinned input match three
    single-task windows bit-for-bit."""
    from incubator_horaedb_spark.operators.rank2pass import attach_global_orders

    df = toy.withColumn("v2", (F.col("k") * 13 % 37).cast("double"))
    got, n = attach_global_orders(
        df,
        [("r_grp", "grp", "k"), ("r_v", "v", "k"), ("r_v2", "v2", "k")],
    )
    assert n == 500
    exp = df
    for name, m in (("r_grp", "grp"), ("r_v", "v"), ("r_v2", "v2")):
        w = Window.orderBy(F.col(m).asc(), F.col("k").asc())
        exp = exp.withColumn(name, F.row_number().over(w).cast("long"))
    cols = ["k", "r_grp", "r_v", "r_v2"]
    assert sorted(got.select(*cols).collect()) == sorted(exp.select(*cols).collect())


def test_multi_order_partition_count_invariance(toy):
    from incubator_horaedb_spark.operators.rank2pass import attach_global_orders

    ref = None
    for nparts in (1, 3, 16):
        got, n = attach_global_orders(
            toy, [("r", "v", "k")], num_partitions=nparts
        )
        assert n == 500
        vals = sorted(got.select("k", "r").collect())
        if ref is None:
            ref = vals
        else:
            assert vals == ref


def test_multi_order_heavy_ties_split(spark):
    """A metric that is one giant tie group must still rank correctly
    (the boundary PAIRS carry the tiebreak, so ties split across
    partitions)."""
    from incubator_horaedb_spark.operators.rank2pass import attach_global_orders

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(400)], "k bigint, v double"
    )
    got, n = attach_global_orders(df, [("r", "v", "k")], num_partitions=8)
    assert n == 400
    rows = {r["k"]: r["r"] for r in got.collect()}
    assert rows == {i: i + 1 for i in range(400)}

def test_multi_order_partitions_balanced(spark):
    """r10 review #1 regression lock: the boundary when-chain must
    actually SPREAD rows across pids (the reversed-iteration bug kept
    ranks correct while collapsing every row into pid<=1)."""
    from incubator_horaedb_spark.operators.rank2pass import attach_global_orders

    df = spark.createDataFrame(
        [(i, float((i * 7919) % 1000)) for i in range(2000)], "k bigint, v double"
    )
    nparts = 8
    base = df.localCheckpoint(eager=True)
    sample = base.select("v", "k").rdd.takeSample(False, 64 * nparts, seed=7)
    # reproduce _pid via the module under test, then check the spread
    from incubator_horaedb_spark.operators import rank2pass as r2

    got, n = attach_global_orders(df, [("r", "v", "k")], num_partitions=nparts)
    assert n == 2000
    # re-derive the pid expression the way attach_global_orders does and
    # count rows per pid: with 2000 rows and 8 ranges, no pid may hold
    # more than half the data (the bug put ~7/8 of rows in one pid)
    import pyspark.sql.functions as F
    pairs = sorted((r["v"], r["k"]) for r in sample)
    step = max(1, len(pairs) // nparts)
    bounds = pairs[step::step][: nparts - 1]
    pid = F.lit(0)
    for i, (bm, bk) in enumerate(bounds):
        cond = (F.col("v") > F.lit(bm)) | ((F.col("v") == F.lit(bm)) & (F.col("k") >= F.lit(bk)))
        pid = F.when(cond, F.lit(i + 1)).otherwise(pid)
    counts = [r["c"] for r in df.groupBy(pid.alias("p")).agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(counts) == nparts
    assert max(counts) <= 1000, counts


def test_multi_order_hash_sample_balanced(spark):
    """r12 optimization §10 lock: the boundary sample now comes from a
    hash-ordered top-N (orderBy(xxhash64).limit) instead of
    rdd.takeSample.  Balance must survive the swap: re-derive bounds the
    way attach_global_orders does and check the pid spread (boundary
    CHOICE never affects rank values — covered by the bit-parity tests —
    but the spread is the property the sample exists for)."""
    from incubator_horaedb_spark.operators.rank2pass import attach_global_orders

    df = spark.createDataFrame(
        [(i, float((i * 7919) % 1000)) for i in range(2000)], "k bigint, v double"
    )
    nparts = 8
    got, n = attach_global_orders(df, [("r", "v", "k")], num_partitions=nparts)
    assert n == 2000
    # mirror the internals: need = sorted({metric, key}); hash-ordered top-N
    base = df.localCheckpoint(eager=True)
    need = sorted({"v", "k"})
    sample = (
        base.select(*need)
        .orderBy(F.xxhash64(*[F.col(c) for c in need]))
        .limit(64 * nparts)
        .collect()
    )
    pairs = sorted((r["v"], r["k"]) for r in sample)
    step = max(1, len(pairs) // nparts)
    bounds = pairs[step::step][: nparts - 1]
    expr = "0"
    for i, (bm, bk) in enumerate(bounds):
        cond = (
            f"(`v` > CAST('{bm!r}' AS DOUBLE) OR "
            f"(`v` = CAST('{bm!r}' AS DOUBLE) AND `k` >= CAST({bk} AS BIGINT)))"
        )
        expr = f"CASE WHEN {cond} THEN {i + 1} ELSE ({expr}) END"
    counts = [
        r["c"]
        for r in df.groupBy(F.expr(expr).alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert len(counts) == nparts
    assert max(counts) <= 1000, counts
