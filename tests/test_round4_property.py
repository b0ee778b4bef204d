"""Property tests: round-4 operators vs independent pure-Python models.

The oracle harness proves Spark == DuckDB on the same SQL definition;
these tests prove the DEFINITION itself is the intended algorithm by
re-deriving results with plain Python/numpy implementations written from
the textbook description (no shared code with the SQL templates).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- models --
def py_levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def py_next_fit(tokens: list[int], capacity: int) -> list[int]:
    """Streaming next-fit packing: bin = (running total before doc) DIV cap."""
    out, cum = [], 0
    for t in tokens:
        out.append(cum // capacity)
        cum += t
    return out


# ---------------------------------------------------------------- spark --
@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from incubator_horaedb_spark.querybank.registry import load

    return {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


def test_edit_distance_matches_python_dp(spark, sf_dir, docs):
    from incubator_horaedb_spark.querybank import registry

    rows = registry.QUERIES["dedup_edit_distance"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = py_levenshtein(docs[r["doc_a"]], docs[r["doc_b"]])
        assert r["edit_dist"] == expect, (r["doc_a"], r["doc_b"])


def test_pack_sequences_matches_python_next_fit(spark, sf_dir):
    from incubator_horaedb_spark.operators.pipeline import PACK_CAPACITY
    from incubator_horaedb_spark.querybank import registry
    from incubator_horaedb_spark.querybank.registry import load

    toks = {
        (r["source"], r["doc_id"] % 8, r["doc_id"]): len(r["text"].split(" "))
        for r in load(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    }
    # rebuild expected bins per (source, shard) stream ordered by doc_id
    from collections import defaultdict

    streams = defaultdict(list)
    for (src, shard, did), n in sorted(toks.items(), key=lambda kv: kv[0][2]):
        streams[(src, shard)].append((did, n))
    expected = defaultdict(lambda: [0, 0, None])  # n_docs, tokens, first
    for (src, shard), items in streams.items():
        bins = py_next_fit([n for _, n in items], PACK_CAPACITY)
        for (did, n), b in zip(items, bins):
            key = (src, shard, b)
            expected[key][0] += 1
            expected[key][1] += n
            if expected[key][2] is None:
                expected[key][2] = did
    rows = registry.QUERIES["pack_sequences"].fn(spark, sf_dir).collect()
    got = {
        (r["source"], r["shard"], r["bin_id"]): [r["n_docs"], r["bin_tokens"], r["first_doc_id"]]
        for r in rows
    }
    assert got == dict(expected)


def test_power_iteration_matches_numpy_model(spark, sf_dir):
    """The operator is DEFINED as 3 unrolled power-iteration rounds, so
    the model is numpy running the same 3 rounds (not the eigen-limit:
    this synthetic corpus has a nearly flat spectrum, lambda1/lambda2 ~
    1.017, so no fixed round count converges to the true eigenvector —
    measured cos 0.33 after 3 exact rounds).  Quantization aside, the
    directions must coincide almost exactly."""
    from incubator_horaedb_spark.querybank import registry
    from incubator_horaedb_spark.querybank.registry import load

    E = np.array(
        [
            r["embedding"]
            for r in load(spark, sf_dir, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    Q = 1 << 20
    Eq = np.floor(E * Q + 0.5) / Q  # the quantized corpus the operator sees
    x = np.full(Eq.shape[1], 0.125)
    for _ in range(3):
        x = Eq.T @ (Eq @ x)
        x = x / np.linalg.norm(x)
    rows = registry.QUERIES["embedding_power_iteration"].fn(spark, sf_dir).collect()
    got = np.zeros(Eq.shape[1])
    for r in rows:
        got[r["dim"] - 1] = r["component"]
    cos = float(got @ x) / (np.linalg.norm(got) * np.linalg.norm(x))
    assert cos > 0.9999, cos


def test_bigram_surprisal_matches_python_lm(spark, sf_dir, docs):
    from incubator_horaedb_spark.querybank import registry

    from collections import Counter

    bigrams, ctxs, per_doc = Counter(), Counter(), {}
    for did, text in docs.items():
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        per_doc[did] = bgs
        bigrams.update(bgs)
        ctxs.update(t for t, _ in bgs)
    q20 = 1 << 20
    rows = registry.QUERIES["text_bigram_surprisal"].fn(spark, sf_dir).collect()
    checked = 0
    for r in rows[:50]:
        bgs = per_doc[r["doc_id"]]
        if not bgs:
            continue
        sq = [
            math.floor(-math.log(bigrams[bg] / ctxs[bg[0]]) * q20 + 0.5) / q20
            for bg in bgs
        ]
        expect = math.floor(sum(sq) / len(sq) * 1_000_000 + 0.5) / 1_000_000
        assert abs(r["mean_bigram_surprisal"] - expect) < 2e-6, r["doc_id"]
        assert r["n_bigrams"] == len(bgs)
        checked += 1
    assert checked > 10


@settings(max_examples=200, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=60),
    cap=st.integers(min_value=16, max_value=1024),
)
def test_next_fit_model_invariants(toks, cap):
    """The python model itself: bins contiguous from 0, every non-final
    bin's token total crosses capacity (that is what 'next-fit' means)."""
    bins = py_next_fit(toks, cap)
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))  # monotone
    # the defining property: doc i's bin = floor(prefix_sum/cap)
    cum = 0
    for t, b in zip(toks, bins):
        assert b == cum // cap
        cum += t
    # every bin except the last crossed the capacity boundary: the total
    # tokens of bins 0..b-1 is at least b*cap (else bin b never starts)
    from collections import Counter

    totals = Counter()
    for t, b in zip(toks, bins):
        totals[b] += t
    running = 0
    for b in range(max(bins)):
        running += totals[b]
        assert running >= (b + 1) * cap


def test_containment_matches_python_shingle_model(spark, sf_dir, docs):
    """Containment values re-derived from a plain-Python shingle model
    (token 3-grams as strings — no shared hash code with the SQL; the
    hash is injective enough on this corpus that distinct-shingle COUNTS
    and intersections agree)."""
    from incubator_horaedb_spark.querybank import registry

    def shingles(text: str) -> set[str]:
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    rows = registry.QUERIES["dedup_containment"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        a, b = shingles(docs[r["doc_small"]]), shingles(docs[r["doc_big"]])
        small = min(len(a), len(b))
        expect = math.floor(len(a & b) / small * 1_000_000 + 0.5) / 1_000_000
        assert abs(r["containment"] - expect) < 2e-6, (r["doc_small"], r["doc_big"])


@settings(max_examples=300, deadline=None)
@given(
    ctx=st.integers(min_value=0, max_value=(1 << 31) - 1),
    nxt=st.integers(min_value=0, max_value=(1 << 31) - 1),
)
def test_bigram_key_packing_roundtrips(ctx, nxt):
    """The packed int64 bigram key (ctx·2^31 + next) recovers its context
    hash exactly by integer division for ALL hash values < 2^31 — the
    invariant text_bigram_surprisal's denominator GROUP BY relies on."""
    key = ctx * (1 << 31) + nxt
    assert key < (1 << 62)  # fits int64 with headroom
    assert key // (1 << 31) == ctx
    assert key % (1 << 31) == nxt


def test_nearest_join_matches_python_model(spark, sf_dir):
    """nearest_join re-derived with a brute-force python model over the
    same deduped inputs: per purchase, the signup minimizing |dt| within
    tolerance, ties backward."""
    from incubator_horaedb_spark.querybank import registry
    from incubator_horaedb_spark.querybank.registry import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_millis("ts").alias("t"), "event_type", "value"
    )
    purchases = {}
    signups = {}
    for r in ev.collect():
        key = (r["user_id"], r["t"])
        if r["event_type"] == "purchase":
            purchases[key] = max(purchases.get(key, float("-inf")), r["value"])
        elif r["event_type"] == "signup":
            signups.setdefault(r["user_id"], []).append(r["t"])
    tol = 2 * 3600 * 1000
    got = {
        (r["user_id"], r["purchase_t"]): r["signup_t"]
        for r in registry.QUERIES["nearest_join_events"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(purchases)
    for (uid, pt), _ in purchases.items():
        cands = [
            s for s in signups.get(uid, []) if abs(s - pt) <= tol
        ]
        if not cands:
            expect = None
        else:
            # min |dt|, ties backward (s <= pt wins), then earliest s
            expect = min(cands, key=lambda s: (abs(s - pt), 0 if s <= pt else 1, s))
        assert got[(uid, pt)] == expect, (uid, pt)
