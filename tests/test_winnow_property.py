"""Property tests for the winnowing fingerprint operator: random token
sequences vs an independent pure-Python model of the algorithm (Schleimer
et al. SIGMOD 2003).  The SQL template (operators/text.py::winnow_from) is
rendered for DuckDB here (fast, no Spark session); the identical template
drives the Spark side, and the gated query hash-compares the two — so
model == DuckDB ⟹ model == Spark.

Also checks the paper's guarantee: any shared token run of length
>= w + k - 1 between two documents produces at least one shared
fingerprint."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators import text as T
from incubator_horaedb_spark.operators.dialect import DUCK, BASE, P

K, W = 3, 4

token = st.text(alphabet="abcdef", min_size=1, max_size=4)
doc = st.lists(token, min_size=0, max_size=30).map(" ".join)


def _hash_tok(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * BASE + ord(c)) % P
    return acc


def _model_winnow(text: str, k: int = K, w: int = W):
    toks = text.split(" ") if text else [""]
    th = [_hash_tok(t) for t in toks]
    if len(th) < k:
        return None
    kg = []
    for i in range(len(th) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc * BASE + th[i + j]) % P
        kg.append(acc)
    if len(kg) < w:
        return None
    sel = sorted({min(kg[i : i + w]) for i in range(len(kg) - w + 1)})
    return sel


def _duck_winnow(texts):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
    )
    rows = con.execute(
        "SELECT doc_id, n_fp, fp_checksum, min_fp FROM ("
        + T.winnow_sql(DUCK, k=K, w=W)
        + ") q ORDER BY doc_id"
    ).fetchall()
    con.close()
    return {r[0]: r[1:] for r in rows}


@settings(max_examples=30, deadline=None)
@given(st.lists(doc, min_size=1, max_size=4))
def test_winnow_matches_model(texts):
    got = _duck_winnow(texts)
    for i, t in enumerate(texts):
        sel = _model_winnow(t)
        if sel is None:
            assert i not in got  # short docs are dropped by both
        else:
            n_fp, checksum, min_fp = got[i]
            assert n_fp == len(sel)
            assert checksum == sum(sel) % P
            assert min_fp == min(sel)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(token, min_size=W + K - 1, max_size=W + K + 4),  # the shared run
    st.lists(token, min_size=0, max_size=5),
    st.lists(token, min_size=0, max_size=5),
)
def test_winnow_shared_substring_guarantee(shared, pre, post):
    """Shared run of >= w+k-1 tokens ⟹ >= 1 shared fingerprint."""
    a = " ".join(pre + shared)
    b = " ".join(shared + post)
    sa, sb = _model_winnow(a), _model_winnow(b)
    assert sa is not None and sb is not None
    assert set(sa) & set(sb), (a, b)
