"""Connected-component cluster labels: the operator definition is the
CONVERGED min label (component-min doc_id) — tested against an independent
union-find model on both engines' execution shapes:

- DuckDB (oracle side): exact recursive-reachability rendering
  (dedup.cc_label_ctes) — no iteration parameter to under-run;
- Spark side: dedup.cc_converged_labels — min-label propagation with a
  pointer-jump accelerator iterated to an ASSERTED fixed point (fails
  loudly at CC_MAX_ROUNDS rather than returning split clusters).

The replaced fixed-k propagation silently split any cluster with graph
diameter > k on BOTH engines identically, so the hash check could never
catch it (VERDICT r04, What's-wrong #2) — the path-graph cases here are
exactly that failure class.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators import dedup
from incubator_horaedb_spark.operators.dialect import DUCK


def _union_find_summary(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for v in parent:
        clusters.setdefault(find(v), []).append(v)
    return sorted((rep, len(members)) for rep, members in clusters.items())


def _duck_summary(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    sql = DUCK.cte_query(
        dedup.cc_label_ctes(DUCK, "edges"),
        dedup.cc_summary_select(DUCK, "labels"),
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_matches_union_find(seed):
    # random clustered graphs (the real near-dup shape: many small groups)
    rng = random.Random(seed)
    edges = set()
    for g in range(12):
        base = g * 10
        members = [base + i for i in range(rng.randint(2, 6))]
        for _ in range(len(members) + 2):
            a, b = rng.sample(members, 2)
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    assert _duck_summary(edges) == _union_find_summary(edges)


def test_cc_long_chain_converges_exactly():
    # a 200-node path with SHUFFLED ids — diameter 199, far beyond any
    # fixed iteration count; must still land in ONE cluster with the
    # min id as representative
    rng = random.Random(42)
    ids = list(range(1000, 1200))
    rng.shuffle(ids)
    edges = [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])]
    assert _duck_summary(edges) == [(1000, 200)]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=120),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_cc_path_graph_property(n, seed):
    # property: ANY path graph (random length, random id permutation)
    # yields exactly one cluster labeled by the component min — the
    # template-chain shape that defeated fixed-k propagation
    rng = random.Random(seed)
    ids = rng.sample(range(100_000), n)
    edges = [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])]
    assert _duck_summary(edges) == [(min(ids), n)]


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_cc_random_graph_property(seed):
    # random sparse graphs: multiple components, bridges, triangles
    rng = random.Random(seed)
    nodes = rng.sample(range(10_000), 40)
    edges = set()
    for _ in range(45):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    assert _duck_summary(edges) == _union_find_summary(edges)


def _spark_summary(spark, edges):
    df = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    df.createOrReplaceTempView("__cctest_edges")
    labels = dedup.cc_converged_labels(spark, "__cctest_edges", "__cctest")
    rows = spark.sql(
        f"SELECT lbl, count(*) AS n FROM {labels} GROUP BY lbl"
    ).collect()
    return sorted((r["lbl"], r["n"]) for r in rows)


def test_spark_cc_long_chain_one_cluster(spark):
    # the Spark execution shape on a 40-node shuffled-id path (diameter 39)
    rng = random.Random(7)
    ids = list(range(500, 540))
    rng.shuffle(ids)
    edges = [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])]
    assert _spark_summary(spark, edges) == [(500, 40)]


def test_spark_cc_adversarial_ordering(spark):
    # alternating high-low ids create local-min labels that defeat naive
    # pointer jumping — convergence assertion must still reach the true
    # component min (via O(diameter) propagation if need be)
    n = 30
    ids = []
    for i in range(n // 2):
        ids += [2 * i + 1, 2 * (n // 2 - i) - 2]  # 1, 28, 3, 26, 5, 24, ...
    edges = [(min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])]
    assert _spark_summary(spark, edges) == [(min(ids), n)]


def test_spark_cc_matches_duckdb(spark):
    rng = random.Random(3)
    nodes = rng.sample(range(1_000), 30)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(35)
            for a, b in [rng.sample(nodes, 2)]
        }
    )
    assert _spark_summary(spark, edges) == _duck_summary(edges)


def test_spark_cc_round_cap_raises(spark):
    # a path longer than a tiny max_rounds must raise, not split silently
    ids = list(range(20))
    edges = [(i, i + 1) for i in range(19)]
    spark.createDataFrame(edges, "doc_a LONG, doc_b LONG").createOrReplaceTempView(
        "__cctest2_edges"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.cc_converged_labels(spark, "__cctest2_edges", "__cctest2", max_rounds=2)
