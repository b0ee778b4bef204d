"""Round-10 operators: multi-resolution GROUPING SETS rollup ladder,
mergeable HLL-sketch rollup, and incremental dedup against a persisted LSH
index.  Each test asserts the operator's own scale/semantics claim (plan
shape, cross-resolution consistency, merge losslessness, equivalence with
the batch pipeline) — the oracle hash gate runs separately in the
correctness harness."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.operators import dedup
from incubator_horaedb_spark.operators.dialect import SPARK
from incubator_horaedb_spark.plans.inspect import explain_str
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank import llm_ops  # noqa: F401 - registers
from incubator_horaedb_spark.querybank import timeseries  # noqa: F401 - registers


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def _exchanges(df) -> int:
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", text))


# --- ts_rollup_ladder ------------------------------------------------------


def test_rollup_ladder_one_shuffle_via_expand(spark, sf_dir, qs):
    # the whole three-resolution ladder is Expand + ONE hash aggregate:
    # exactly one exchange, and an Expand node feeding it
    df = qs["ts_rollup_ladder"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert _exchanges(df) == 1, text
    assert "Expand" in text, text


def test_rollup_ladder_resolutions_consistent(spark, sf_dir, qs):
    # the ladder is self-consistent: each day row's count equals the sum
    # of its hour rows' counts, and each hour row's count the sum of its
    # minute rows' — the invariant a continuous-aggregate maintains
    rows = qs["ts_rollup_ladder"](spark, sf_dir).collect()
    by_res: dict[str, dict] = {"minute": {}, "hour": {}, "day": {}}
    for r in rows:
        by_res[r["res"]][(r["bucket"], r["event_type"])] = r["n"]

    def _roll(fine: dict, trunc) -> dict:
        out: dict = {}
        for (b, et), n in fine.items():
            k = (trunc(b), et)
            out[k] = out.get(k, 0) + n
        return out

    assert by_res["hour"] == _roll(
        by_res["minute"], lambda b: b.replace(minute=0)
    )
    assert by_res["day"] == _roll(by_res["hour"], lambda b: b.replace(hour=0))


# --- hll_rollup_merge ------------------------------------------------------


def test_kmv_merge_matches_direct_sketch(spark, sf_dir):
    # merge losslessness: the KMV k-min state is a pure function of the
    # distinct set (k-min of the union of per-part k-mins == k-min of the
    # whole set), so merged and direct estimates are bitwise identical —
    # the property that makes the rollup ladder maintainable without
    # re-scans.  (Datasketches HLL — the r10 implementation — does NOT
    # hold this exactly: its union estimate depends on sparse-mode
    # promotion, measured divergent on 50/150 groups at sf0.1 in r12,
    # which is why hll_rollup_merge moved to the KMV theta sketch.)
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partial,
    )

    # k=64 with ~150+ distinct users forces the estimator (non-exact) path
    k = 64
    ev = registry.load(spark, sf_dir, "events")
    merged = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bh"))
        .agg(kmv_partial("user_id", k).alias("sk"))
        .groupBy("event_type", F.to_date("bh").alias("bd"))
        .agg(kmv_merge("sk", k).alias("sk"))
        .select("event_type", "bd", kmv_estimate("sk", k).alias("est"))
    )
    direct = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("hour", "ts")).alias("bd")
    ).agg(kmv_partial("user_id", k).alias("sk")).select(
        "event_type", "bd", kmv_estimate("sk", k).alias("est")
    )
    m = {(r["event_type"], r["bd"]): r["est"] for r in merged.collect()}
    d = {(r["event_type"], r["bd"]): r["est"] for r in direct.collect()}
    assert m == d


def test_kmv_excludes_nulls_like_count_distinct(spark):
    # xxhash64(NULL) is the SEED hash, not NULL — without the explicit
    # null gate the sketch would count a phantom distinct value that
    # COUNT(DISTINCT) (and the reference's accumulator) excludes
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.sketches import (
        kmv_estimate,
        kmv_partial,
    )

    df = spark.createDataFrame([(1,), (2,), (3,), (None,), (None,)], "v int")
    r = df.agg(kmv_partial("v", 64).alias("sk")).select(
        F.size("sk").alias("n"), kmv_estimate("sk", 64).alias("est")
    ).collect()[0]
    assert (r["n"], r["est"]) == (3, 3.0)


def test_kmv_estimator_accuracy_beyond_k(spark):
    # true-approx regime: 10_000 distinct ids sketched at k=256 must land
    # within 4·rsd (≈25%) of the truth — in practice far closer
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.functions.sketches import (
        kmv_estimate,
        kmv_partial,
    )

    k = 256
    rsd = (k - 2) ** -0.5
    df = spark.range(10_000).select(F.col("id"))
    est = df.agg(kmv_partial("id", k).alias("sk")).select(
        kmv_estimate("sk", k).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 10_000) <= 4 * rsd * 10_000, est


def test_hll_rollup_exact_at_small_cardinality(spark, sf_dir, qs):
    # sf0.001 group cardinalities sit below k: merge_diff is exactly 0.0,
    # the accuracy flag holds, and exact_ndv matches the direct count
    from pyspark.sql import functions as F

    ev = registry.load(spark, sf_dir, "events")
    exact = {
        (r["event_type"], r["bucket_day"]): r["ndv"]
        for r in ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("bucket_day")
        )
        .agg(F.count_distinct("user_id").alias("ndv"))
        .collect()
    }
    rows = qs["hll_rollup_merge"](spark, sf_dir).collect()
    got = {(r["event_type"], r["bucket_day"]): r["exact_ndv"] for r in rows}
    assert got == exact
    assert all(r["merge_diff"] == 0.0 for r in rows)
    assert all(r["within_4rsd"] for r in rows)


# --- dedup_incremental_lsh -------------------------------------------------


def test_incremental_equals_cross_side_of_batch(spark, sf_dir, qs):
    # the incremental pipeline (persisted corpus index + fresh delta bands)
    # finds EXACTLY the batch pipeline's pairs whose sides fall in
    # different halves: the index path loses nothing and adds nothing
    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in qs["dedup_incremental_lsh"](spark, sf_dir).collect()
    }
    corpus = lambda i: i % dedup.INC_MOD < dedup.INC_CORPUS_LT  # noqa: E731
    batch = {}
    for r in qs["dedup_minhash_lsh"](spark, sf_dir).collect():
        a, b = r["doc_a"], r["doc_b"]
        if corpus(a) != corpus(b):
            lo, hi = (a, b) if corpus(a) else (b, a)
            batch[(lo, hi)] = r["jaccard"]
    assert inc == batch
    # orientation contract: doc_a is always the indexed corpus side
    for a, b in inc:
        assert corpus(a) and not corpus(b)


# --- sequence-snapshot reads (Table.read as_of_seq) -------------------------


def test_snapshot_read_as_of_seq(spark, tmp_path):
    from incubator_horaedb_spark.frontends.sql_shim import Engine
    from incubator_horaedb_spark.table import Table

    engine = Engine(spark, str(tmp_path / "store"))
    engine.execute_sql(
        "CREATE TABLE snap (k string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic "
        "WITH(enable_ttl='false', update_mode='OVERWRITE', segment_duration='2h')"
    )
    engine.execute_sql("INSERT INTO snap (k, v, t) VALUES ('a', 1, 1000), ('b', 2, 2000)")
    tbl = Table(spark, engine.catalog, "snap")
    s1 = tbl.last_seq()
    engine.execute_sql("INSERT INTO snap (k, v, t) VALUES ('a', 10, 1000), ('c', 3, 3000)")

    def state(df):
        return sorted((r["k"], r["v"]) for r in df.collect())

    # latest: 'a' overwritten, 'c' appended
    assert state(tbl.read()) == [("a", 10.0), ("b", 2.0), ("c", 3.0)]
    # snapshot at s1: the second write is invisible — 'a' still 1, no 'c'
    assert state(tbl.read(as_of_seq=s1)) == [("a", 1.0), ("b", 2.0)]
    # before any write: empty
    assert state(tbl.read(as_of_seq=0)) == []
    # compaction GCs superseded versions (LSM semantics): the old 'a'
    # version is reclaimed, so the pre-compaction snapshot now sees only
    # the versions that survived; the latest view is unchanged
    tbl.compact()
    assert state(tbl.read(as_of_seq=s1)) == [("b", 2.0)]
    assert state(tbl.read()) == [("a", 10.0), ("b", 2.0), ("c", 3.0)]


def test_incremental_index_roundtrips_through_parquet(spark, sf_dir):
    # the persisted band index read back from parquet is row-identical to
    # the bands computed in-session (the query must only see the on-disk
    # copy, so the write path must be lossless)
    import tempfile

    from incubator_horaedb_spark.querybank.llm_ops import _staged_shingles

    hs = _staged_shingles(spark, sf_dir)
    spark.sql(
        f"SELECT * FROM {hs} WHERE {dedup.incremental_corpus_pred()}"
    ).createOrReplaceTempView("__t10_hs_idx")
    sig = dedup.minhash_sig_select(SPARK, "__t10_hs_idx")
    spark.sql(sig).createOrReplaceTempView("__t10_sig")
    bands = spark.sql(dedup.bands_select(SPARK, "__t10_sig"))
    path = tempfile.mkdtemp(prefix="t10_lsh_idx_")
    bands.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, bands.collect()))
