"""Plan-shape + golden-value assertions for the round-3 late additions
(statistical aggs, histogram, pivot, RANGE frames, winnowing, rare-token,
SemDeDup, int8 quantization): the scale claims in their docstrings hold in
the physical plans, and the numerically-subtle formulas are pinned by
hand-computed golden values."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.plans.inspect import explain_str
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank.llm_ops import *  # noqa: F401,F403 - registers queries
from incubator_horaedb_spark.querybank.olap_ext import *  # noqa: F401,F403


def _exchanges(df) -> int:
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", text))


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def _hash_exchanges(df) -> int:
    return len(re.findall(r"Exchange hashpartitioning", explain_str(df, "simple")))


def test_corr_single_agg_shuffle(spark, sf_dir, qs):
    # one partial->final hash agg on l_returnflag: exactly one hash
    # exchange (the ORDER BY of the 3-row result adds a trivial range one)
    df = qs["stats_corr_regr"](spark, sf_dir)
    assert _hash_exchanges(df) == 1, explain_str(df, "simple")


def test_corr_matches_numpy(spark, sf_dir, qs):
    # the integer-moment formulas against numpy's reference implementation
    import numpy as np

    rows = {r["l_returnflag"]: r for r in qs["stats_corr_regr"](spark, sf_dir).collect()}
    import duckdb

    raw = duckdb.sql(
        f"SELECT l_returnflag, CAST(floor(l_quantity + 0.5) AS BIGINT) AS x, "
        f"CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    by_flag: dict = {}
    for f, x, y in raw:
        by_flag.setdefault(f, ([], []))
        by_flag[f][0].append(x)
        by_flag[f][1].append(y)
    for f, (xs, ys) in by_flag.items():
        x, y = np.array(xs, dtype=float), np.array(ys, dtype=float)
        expect = np.corrcoef(x, y)[0, 1]
        got = rows[f]["corr_qty_price"]
        assert abs(got - expect) < 1e-6, (f, got, expect)
        slope = np.polyfit(x, y, 1)[0]
        assert abs(rows[f]["regr_slope"] - slope) < 1e-4, (f, rows[f]["regr_slope"], slope)


def test_histogram_single_shuffle_and_total(spark, sf_dir, qs):
    df = qs["numeric_histogram"](spark, sf_dir)
    assert _hash_exchanges(df) == 1, explain_str(df, "simple")
    rows = df.collect()
    total = sum(r["n_items"] for r in rows)
    n = registry.load(spark, sf_dir, "lineitem").count()
    assert total == n  # clamped edges: every row lands in exactly one bin


def test_pivot_no_discovery_scan(spark, sf_dir, qs):
    # fixed value list: the plan contains exactly ONE scan of events
    df = qs["pivot_event_counts"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert len(re.findall(r"Scan parquet|FileScan", text)) == 1, text
    rows = {r["user_bucket"]: r for r in df.collect()}
    ev = registry.load(spark, sf_dir, "events")
    total = sum(sum(r[t] for t in ("click", "error", "purchase", "signup", "view"))
                for r in rows.values())
    assert total == ev.count()


def test_range_frame_single_shuffle(spark, sf_dir, qs):
    # one user-keyed window exchange
    df = qs["window_range_time_frame"](spark, sf_dir)
    assert _exchanges(df) == 1, explain_str(df, "simple")


def test_winnow_guarantee(spark):
    """Winnowing's core guarantee: two documents sharing a long-enough
    token run (>= w+k-1 tokens) share at least one fingerprint."""
    from incubator_horaedb_spark.operators import text as T
    from incubator_horaedb_spark.operators.dialect import DUCK

    import duckdb

    con = duckdb.connect()
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        f"(1, 'xx yy {shared} zz'), "
        f"(2, 'aa {shared} bb cc dd'), "
        "(3, 'unrelated words entirely different tokens here now ok')"
        ") AS t(doc_id, text)"
    )
    # k=3, w=4: shared run of 8 tokens -> >= 8-(3-1)-(4-1)+... >= 1 shared window min
    rows = con.execute(
        "SELECT doc_id, fp_checksum, n_fp FROM (" + T.winnow_sql(DUCK, k=3, w=4) + ") q"
    ).fetchall()
    assert len(rows) == 3
    # doc1 & doc2 share a fingerprint: verify via the wf sets directly
    wf = con.execute(
        """WITH tokh AS (SELECT doc_id, list_transform(string_split(text, ' '),
             s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(1, length(s) + 1), j -> ord(substr(s, j, 1)))),
                  (acc, c) -> (acc * 131 + c) % 2147483647)) AS th FROM documents),
        kg AS (SELECT doc_id, list_transform(range(1, len(th) - 1),
               i -> ((((CAST(0 AS BIGINT) * 131 + th[i]) % 2147483647) * 131 + th[i+1])
                     % 2147483647 * 131 + th[i+2]) % 2147483647) AS kg
               FROM tokh WHERE len(th) >= 3),
        wf AS (SELECT doc_id, list_distinct(list_transform(range(1, len(kg) - 2),
               i -> list_min(list_slice(kg, i, i + 3)))) AS wf FROM kg WHERE len(kg) >= 4)
        SELECT a.doc_id, b.doc_id, len(list_intersect(a.wf, b.wf)) AS shared
        FROM wf a JOIN wf b ON a.doc_id < b.doc_id"""
    ).fetchall()
    shared_12 = next(s for a, b, s in wf if (a, b) == (1, 2))
    assert shared_12 >= 1
    shared_13 = next(s for a, b, s in wf if (a, b) == (1, 3))
    assert shared_13 == 0


def test_winnow_single_window_shuffle(spark, sf_dir, qs):
    # all array work map-side; one exchange for the group_size window
    df = qs["text_winnow_fingerprint"](spark, sf_dir)
    assert _exchanges(df) == 1, explain_str(df, "simple")


def test_rare_token_join_copartitioned(spark, sf_dir, qs):
    # freq build + re-join + per-doc agg: bounded exchanges (token hash
    # agg, join key reuse, doc agg) — never more than 4.  (At test scale
    # AQE may broadcast the small freq side — that is the right call
    # per-scale and harmless: the shuffle-join shape is what the SQL
    # declares when the vocabulary outgrows the broadcast threshold.)
    df = qs["text_rare_token_ratio"](spark, sf_dir)
    assert _exchanges(df) <= 4, explain_str(df, "simple")


def test_semdedup_survivor_consistency(spark, sf_dir, qs):
    rows = qs["embedding_semdedup"](spark, sf_dir).collect()
    emb = registry.load(spark, sf_dir, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert 0 < r["n_survivors"] <= r["n_vecs"]


def test_int8_quantize_bounds(spark, sf_dir, qs):
    # mean_abs_err is the per-VECTOR L1 reconstruction error (64 dims);
    # each dim errs at most half a quantization step = mx/254
    rows = qs["embedding_int8_quantize"](spark, sf_dir).collect()
    import duckdb

    mx = duckdb.sql(
        f"SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    bound = 64 * mx / 254.0 + 2**-20  # per-dim half-steps + dyadic slack
    for r in rows:
        assert 0 <= r["mean_abs_err"] <= bound, (r["label"], r["mean_abs_err"], bound)


def test_pq_codes_shape(spark, sf_dir, qs):
    """PQ training yields <= PQ_KSUB codes per subspace covering every
    vector exactly once per subspace (the 64:1 compression invariant)."""
    from incubator_horaedb_spark.operators.similarity import PQ_KSUB, PQ_M

    rows = qs["pq_train"](spark, sf_dir).collect()
    subsp = {}
    for r in rows:
        assert 0 <= r["cid"] < PQ_KSUB
        subsp[r["subsp"]] = subsp.get(r["subsp"], 0) + r["n_members"]
    n = registry.load(spark, sf_dir, "embeddings").count()
    assert set(subsp) == set(range(1, PQ_M + 1))
    assert all(v == n for v in subsp.values())


def test_pq_adc_approximates_exact(spark, sf_dir, qs):
    """ADC top-5 must overlap the exact quantized top-5 (recall sanity —
    PQ is lossy, but on this corpus the top neighbor set is stable)."""
    adc = qs["ann_pq_adc"](spark, sf_dir).collect()
    exact = qs["ann_cosine_bruteforce"](spark, sf_dir).collect()
    by_q_adc: dict = {}
    for r in adc:
        by_q_adc.setdefault(r["qid"], set()).add(r["vec_id"])
    by_q_exact: dict = {}
    for r in exact:
        by_q_exact.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(by_q_adc[q] & by_q_exact[q]) / len(by_q_exact[q]) for q in by_q_exact
    ]
    assert sum(recalls) / len(recalls) >= 0.2, recalls
