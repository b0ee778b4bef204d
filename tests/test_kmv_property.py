"""Property tests for the KMV theta sketch (functions/sketches.py).

The exact-by-construction driver gates (thetasketch_distinct_users,
hll_rollup_merge, sketch_rollup_persisted) rest on one theorem: the k
smallest distinct hashes of a set equal the k smallest of the union of
each part's k smallest, for ANY partition of the set — so merged and
direct sketches are identical arrays and their estimates are bitwise
equal.  These tests check that theorem and the estimator against an
independent pure-Python model on random multisets and random partitions,
including the boundary cases the sf sweeps cannot isolate (|set| == k,
duplicates straddling parts, all-duplicate input).  One Spark cross-check
pins the DataFrame expressions to the same model.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _model_sketch(hashes, k):
    """k-min of the distinct hash set — the KMV state."""
    return sorted(set(hashes))[:k]


def _model_estimate(sketch, k):
    """Mirror of sketches.kmv_estimate in pure Python (same doubles,
    same discrete-floor clamp)."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = sketch[k - 1]
    frac = max((float(kth) + float(2**63)) / float(2**64), 2.0**-64)
    return float(k - 1) / frac


@given(
    vals=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                  min_size=0, max_size=400),
    k=st.sampled_from([1, 2, 8, 64]),
    nparts=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
@settings(max_examples=300, deadline=None)
def test_kmin_merge_identity_any_partition(vals, k, nparts, data):
    # assign every value (duplicates included) to a random part — the
    # same distinct value may land in several parts, like a user_id
    # appearing in many hours/shards
    parts = [[] for _ in range(nparts)]
    for v in vals:
        parts[data.draw(st.integers(0, nparts - 1), label="part")].append(v)
    direct = _model_sketch(vals, k)
    merged_input = [h for p in parts for h in _model_sketch(p, k)]
    merged = _model_sketch(merged_input, k)
    assert merged == direct
    assert _model_estimate(merged, k) == _model_estimate(direct, k)


@given(
    n=st.integers(min_value=0, max_value=3000),
    k=st.sampled_from([64, 256]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_estimator_bound_on_uniform_hashes(n, k, seed):
    # with genuinely uniform 64-bit "hashes" the estimate must sit inside
    # a generous 8·rsd envelope (the gates assert 4·rsd on xxhash64
    # output at sf tiers; 8·rsd at 60 examples keeps the flake rate
    # negligible while still catching an off-by-one in the k-th index or
    # a mis-scaled fraction, which shift the estimate by k-sized factors)
    import random

    rng = random.Random(seed)
    hashes = [rng.randint(-(2**63), 2**63 - 1) for _ in range(n)]
    ndv = len(set(hashes))
    est = _model_estimate(_model_sketch(hashes, k), k)
    if ndv < k:
        assert est == float(ndv)
    else:
        rsd = (k - 2) ** -0.5
        assert abs(est - ndv) <= 8 * rsd * ndv


@pytest.fixture(scope="module")
def spark():
    from incubator_horaedb_spark.session import get_spark

    return get_spark("test-kmv-prop", cpus=4)


def test_spark_expressions_match_model(spark):
    # one deterministic cross-check: the DataFrame expressions compute the
    # same sketch and estimate as the model, on data that exercises the
    # duplicate-across-parts and |set|>k paths (xxhash64 supplies the real
    # hash; the model consumes Spark's own hashes so the comparison
    # isolates the sketch/merge/estimate logic)
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partial,
    )

    k = 32
    rows = [(i % 97, i % 5) for i in range(600)]  # 97 distinct vals, 5 parts
    df = spark.createDataFrame(rows, "v long, part int")
    hashes = [
        r["h"] for r in df.select(F.xxhash64("v").alias("h")).distinct().collect()
    ]
    expect_sketch = _model_sketch(hashes, k)
    expect_est = _model_estimate(expect_sketch, k)

    direct = df.agg(kmv_partial("v", k).alias("sk")).select(
        F.col("sk"), kmv_estimate("sk", k).alias("est")
    ).collect()[0]
    merged = (
        df.groupBy("part")
        .agg(kmv_partial("v", k).alias("sk"))
        .agg(kmv_merge("sk", k).alias("sk"))
        .select(F.col("sk"), kmv_estimate("sk", k).alias("est"))
        .collect()[0]
    )
    assert list(direct["sk"]) == expect_sketch
    assert list(merged["sk"]) == expect_sketch
    assert direct["est"] == expect_est == merged["est"]
