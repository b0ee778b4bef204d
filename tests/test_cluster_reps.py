"""Connected-component cluster representatives: property test of the
fixed-k min-label propagation (operators/dedup.py cc_*) against an
independent union-find model, on random edge sets executed through the
REAL Spark pipeline shape (SQL iteration over temp views).
"""

from __future__ import annotations

import random

import duckdb
import pytest

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


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_matches_union_find(seed):
    # random clustered graphs (the real near-dup shape: many small groups):
    # the min-label CTE chain (DuckDB rendering of the same dual-dialect
    # template Spark runs) must equal union-find whenever component
    # diameter <= CC_ITERS — guaranteed here by group size <= 6.
    rng = random.Random(seed)
    edges = set()
    for g in range(12):
        base = g * 10
        members = [base + i for i in range(rng.randint(2, 6))]
        for _ in range(len(members) + 2):
            a, b = rng.sample(members, 2)
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    sql = DUCK.cte_query(
        dedup.cc_label_ctes(DUCK, "edges"),
        dedup.cc_summary_select(DUCK, f"l{dedup.CC_ITERS}"),
    )
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == _union_find_summary(edges)


def test_cc_long_chain_needs_iters():
    # a chain of length CC_ITERS converges exactly at the iteration bound;
    # (a longer chain would not — the fixed k is part of the operator
    # definition and both engines run the same k, so parity still holds)
    edges = [(i, i + 1) for i in range(dedup.CC_ITERS)]
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    sql = DUCK.cte_query(
        dedup.cc_label_ctes(DUCK, "edges"),
        dedup.cc_summary_select(DUCK, f"l{dedup.CC_ITERS}"),
    )
    got = con.execute(sql).fetchall()
    assert got == [(0, dedup.CC_ITERS + 1)]
