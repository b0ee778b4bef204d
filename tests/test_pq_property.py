"""Property test for product quantization: the SQL training pipeline
(operators/similarity.py pq_* fragments, rendered for DuckDB — the same
template drives the gated Spark side) vs an independent numpy model of
Lloyd's algorithm on the 2^-20-quantized grid.

The claim under test is the determinism argument: because every
assignment distance is an EXACT dyadic double, numpy's vectorized
argmin(L2²) and SQL's sequential fold rank identically — no tolerance
is needed anywhere."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators import similarity as S
from incubator_horaedb_spark.operators.dialect import DUCK

Q = S.Q


def _model_pq(vecs: np.ndarray):
    """numpy Lloyd on the quantized grid, mirroring pq_*_select exactly."""
    n, dim = vecs.shape
    m, sd, ksub = S.PQ_M, S.PQ_SUBDIM, S.PQ_KSUB
    q = np.floor(vecs * Q + 0.5) / Q  # _quantize_sql
    subs = q.reshape(n, m, sd)
    assigns = np.zeros((n, m), dtype=int)
    cbs = [subs[:ksub, s, :].copy() for s in range(m)]  # pq_init: first KSUB
    for r in range(1, S.PQ_ROUNDS + 1):
        for s in range(m):
            # exact squared L2; ties -> lowest centroid index (cid order)
            d2 = ((subs[:, s, :, None] - cbs[s].T[None, :, :]) ** 2).sum(axis=1)
            assigns[:, s] = np.argmin(d2, axis=1)  # argmin takes first on ties
        if r < S.PQ_ROUNDS:
            for s in range(m):
                for c in range(ksub):
                    members = subs[assigns[:, s] == c, s, :]
                    if len(members):
                        cbs[s][c] = np.floor(
                            (members.sum(axis=0) / len(members)) * Q + 0.5
                        ) / Q
    return assigns


def _duck_pq(vecs: np.ndarray):
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in v)}])" for i, v in enumerate(vecs)
    )
    con.execute(
        f"CREATE TABLE embeddings AS SELECT * FROM (VALUES {rows}) t(vec_id, embedding)"
    )
    ctes = S.pq_train_ctes(DUCK, "embeddings")
    sql = DUCK.cte_query(
        ctes, f"SELECT vec_id, subsp, cid FROM pa{S.PQ_ROUNDS} ORDER BY vec_id, subsp"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_pq_assignment_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(S.PQ_KSUB, 40))
    vecs = rng.uniform(-0.6, 0.6, size=(n, S.DIM))
    model = _model_pq(vecs)
    got = _duck_pq(vecs)
    assert len(got) == n * S.PQ_M
    # SQL cids are the SEEDING vec_ids (0..KSUB-1) == numpy centroid index
    for vec_id, subsp, cid in got:
        assert model[vec_id, subsp - 1] == cid, (vec_id, subsp, cid)
