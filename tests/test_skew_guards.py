"""Skew guards for dedup candidate joins (HOT_SHINGLE_DF_CAP /
BAND_BUCKET_CAP) and the blocked-GEMM block-size guard.

A shingle or LSH bucket shared by f docs emits f² join rows — one
boilerplate key at df=10⁵ is a 10¹⁰-row hotspot.  These tests pin that the
caps bound candidate generation while true near-dup pairs survive.
"""

from __future__ import annotations

import pytest

from incubator_horaedb_spark.operators import dedup, similarity
from incubator_horaedb_spark.operators.dialect import SPARK


@pytest.fixture()
def skew_docs(spark):
    # 12 docs whose ONLY overlap is one boilerplate sentence (3 shared
    # shingles at df=12), plus one genuine duplicate pair (df=2 shingles)
    boiler = "click here to subscribe to our newsletter today"
    docs = [
        (i, f"report {i} section alpha beta gamma delta item{i} epsilon zeta. {boiler}")
        for i in range(12)
    ]
    docs += [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("skewdocs")
    spark.sql(dedup.tokh_select(SPARK, "skewdocs")).createOrReplaceTempView("sk_tokh")
    spark.sql(dedup.hs_from_tokh_select(SPARK, "sk_tokh")).createOrReplaceTempView("sk_hs")
    return spark


def test_ngram_hot_shingle_cap_bounds_candidates(skew_docs):
    spark = skew_docs
    # threshold ~0 exposes every candidate pair that shares >=1 join shingle
    uncapped = spark.sql(dedup.ngram_pairs_from(SPARK, "sk_hs", 0.001)).collect()
    capped = spark.sql(
        dedup.ngram_pairs_from(SPARK, "sk_hs", 0.001, df_cap=5)
    ).collect()
    # without the cap the boilerplate shingles join all 12 docs pairwise
    assert len(uncapped) == 12 * 11 // 2 + 1
    # with the cap only the true duplicate pair generates candidates
    assert {(r.doc_a, r.doc_b) for r in capped} == {(100, 101)}
    # and the surviving pair's jaccard is exact (sizes are uncapped)
    assert capped[0].jaccard == 1.0


def test_ngram_cap_default_is_noop_at_test_scale(skew_docs):
    spark = skew_docs
    # default cap (10k) far above any df here → identical to uncapped
    a = spark.sql(dedup.ngram_pairs_from(SPARK, "sk_hs", 0.8)).collect()
    assert {(r.doc_a, r.doc_b) for r in a} == {(100, 101)}


def test_minhash_band_bucket_cap(skew_docs):
    spark = skew_docs
    # 12 identical docs → identical signatures → one 12-doc LSH bucket/band
    docs = [(i, "same exact text for every single document here") for i in range(12)]
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "bucketdocs"
    )
    spark.sql(dedup.tokh_select(SPARK, "bucketdocs")).createOrReplaceTempView("bk_tokh")
    spark.sql(dedup.hs_from_tokh_select(SPARK, "bk_tokh")).createOrReplaceTempView("bk_hs")
    spark.sql(dedup.minhash_sig_select(SPARK, "bk_hs")).createOrReplaceTempView("bk_sig")
    uncapped = spark.sql(
        dedup.minhash_pairs_select(SPARK, "bk_hs", "bk_sig", 0.8)
    ).collect()
    assert len(uncapped) == 12 * 11 // 2  # degenerate bucket: f² blowup
    capped = spark.sql(
        dedup.minhash_pairs_select(SPARK, "bk_hs", "bk_sig", 0.8, bucket_cap=5)
    ).collect()
    assert capped == []  # over-cap bucket contributes no candidates


def test_gemm_block_size_guard(spark, monkeypatch):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.25]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(similarity, "MAX_BLOCK_ROWS", 4)
    with pytest.raises(ValueError, match="exceeds MAX_BLOCK_ROWS"):
        similarity.blocked_topk(emb, k=2, n_queries=2)
    with pytest.raises(ValueError, match="exceeds MAX_BLOCK_ROWS"):
        similarity.blocked_near_dup_pairs(emb, threshold=0.9)
    # under the cap the guard is invisible
    monkeypatch.setattr(similarity, "MAX_BLOCK_ROWS", 1 << 18)
    assert similarity.blocked_topk(emb, k=2, n_queries=2).count() > 0


def test_ngram_prefix_filter_matches_all_pairs(skew_docs):
    spark = skew_docs
    for t in (0.8, 0.5, 0.25):
        pfx = spark.sql(dedup.ngram_pairs_prefix_from(SPARK, "sk_hs", t)).collect()
        allp = spark.sql(dedup.ngram_pairs_from(SPARK, "sk_hs", t, df_cap=None)).collect()
        key = lambda rows: sorted((r.doc_a, r.doc_b, r.jaccard) for r in rows)
        assert key(pfx) == key(allp), t


def test_ngram_prefix_length_exact_integer(spark):
    # n=5, t=0.8: ceil(0.8*5) must be 4 (prefix length 2); the DOUBLE
    # 0.8*5 = 4.000000000000000222 would ceil to 5 and MISS the pair
    # overlapping in exactly 4 of 5 shingles
    docs = [
        (0, "a b c d e f g"),   # 5 3-gram shingles
        (1, "a b c d e f zz"),  # shares the first 4
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("pfxdocs")
    spark.sql(dedup.tokh_select(SPARK, "pfxdocs")).createOrReplaceTempView("pf_tokh")
    spark.sql(dedup.hs_from_tokh_select(SPARK, "pf_tokh")).createOrReplaceTempView("pf_hs")
    # J = 4/6 = 0.667: qualifies at t=4/6 exactly
    got = spark.sql(
        dedup.ngram_pairs_prefix_from(SPARK, "pf_hs", 0.666)
    ).collect()
    ref = spark.sql(
        dedup.ngram_pairs_from(SPARK, "pf_hs", 0.666, df_cap=None)
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(0, 1)}
    assert {(r.doc_a, r.doc_b) for r in ref} == {(0, 1)}


def test_ngram_prefix_avoids_boilerplate_hotspot(skew_docs):
    spark = skew_docs
    # the df=12 boilerplate shingles sort LAST in the frequency order —
    # no document's prefix contains them at t=0.8, so candidate
    # generation never touches the hotspot and the true pair survives
    # with its exact jaccard (no cap, no under-estimate)
    got = spark.sql(dedup.ngram_pairs_prefix_from(SPARK, "sk_hs", 0.8)).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(100, 101)}
    assert got[0].jaccard == 1.0
