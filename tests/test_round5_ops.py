"""Round-5 operators: QUALIFY rewrite, gap report, CUSUM, session paths,
RFM, dup-inflation — semantics and rewrite-correctness tests (the value
gate is the DuckDB oracle harness; these check invariants and the shim
surface)."""

from __future__ import annotations

import os

import pytest

from incubator_horaedb_spark import querybank
from incubator_horaedb_spark.frontends.sql_shim import rewrite_qualify

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def qs():
    return querybank.queries()


# --- rewrite_qualify ---------------------------------------------------------


def test_qualify_rewrite_basic():
    out = rewrite_qualify(
        "SELECT a, b AS bb FROM t QUALIFY row_number() OVER (ORDER BY c) = 1"
    )
    assert out.startswith("SELECT a, bb FROM (")
    assert "(row_number() OVER (ORDER BY c) = 1) AS __qualify" in out
    assert out.rstrip().endswith("WHERE __qualify")


def test_qualify_rewrite_preserves_tail():
    out = rewrite_qualify(
        "SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2 ORDER BY a LIMIT 5"
    )
    assert "WHERE __qualify ORDER BY a LIMIT 5" in out


def test_qualify_rewrite_noop_without_clause():
    sql = "SELECT a FROM t WHERE b = 'QUALIFY inside a string is fine'"
    assert rewrite_qualify(sql) == sql


def test_qualify_rewrite_ignores_nested():
    # QUALIFY inside a parenthesized subquery is not this statement's clause
    sql = "SELECT a FROM (SELECT a FROM t) q WHERE a > 0"
    assert rewrite_qualify(sql) == sql


def test_qualify_rewrite_rejects_star():
    with pytest.raises(ValueError, match="SELECT \\*"):
        rewrite_qualify("SELECT * FROM t QUALIFY row_number() OVER (ORDER BY a) = 1")


def test_qualify_rewrite_rejects_unaliased_expression():
    with pytest.raises(ValueError, match="alias it"):
        rewrite_qualify("SELECT a + 1 FROM t QUALIFY rank() OVER (ORDER BY a) = 1")


def test_qualify_through_engine(spark, tmp_path):
    from incubator_horaedb_spark.frontends.sql_shim import Engine

    e = Engine(spark, str(tmp_path / "store"))
    e.execute_sql(
        "CREATE TABLE qd (k string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic WITH(enable_ttl='false')"
    )
    e.execute_sql(
        "INSERT INTO qd (k, v, t) VALUES ('a', 1, 1000), ('a', 9, 2000), "
        "('a', 5, 3000), ('b', 7, 4000)"
    )
    df = e.execute_sql(
        "SELECT k, v FROM qd QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY v DESC) = 1 ORDER BY k"
    )
    assert [(r["k"], r["v"]) for r in df.collect()] == [("a", 9.0), ("b", 7.0)]


def test_qualify_plan_single_window_shuffle(spark, qs):
    df = qs["window_qualify_topn"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the rewrite compiles to the plain window + filter shape: exactly one
    # exchange (the window's partition shuffle), no join, no extra sort pass
    assert plan.count("Exchange") <= 2 and "Join" not in plan


# --- semantics invariants ----------------------------------------------------


def test_gap_report_gaps_exceed_threshold(spark, qs):
    rows = qs["ts_gap_report"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["gap_ms"] == r["gap_end_ms"] - r["gap_start_ms"]
        assert r["gap_ms"] > 900000


def test_cusum_one_row_per_series_and_deterministic(spark, qs):
    a = {(r["event_type"]): (r["change_day"], r["cusum_extreme"], r["n_days"])
         for r in qs["changepoint_cusum"](spark, SF_DIR).collect()}
    b = {(r["event_type"]): (r["change_day"], r["cusum_extreme"], r["n_days"])
         for r in qs["changepoint_cusum"](spark, SF_DIR).collect()}
    assert a and a == b  # bit-stable across runs (dyadic running sum)
    for day, _s, n_days in a.values():
        assert 0 < n_days and day >= 19723  # 2024-01-01 in epoch days


def test_event_paths_ranked_and_bounded(spark, qs):
    rows = qs["event_path_topk"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert len(r["path"].split(">")) == 3


def test_rfm_cells_are_quartile_coded(spark, qs):
    rows = qs["rfm_segmentation"](spark, SF_DIR).collect()
    assert rows
    total = 0
    for r in rows:
        cell = r["rfm_cell"]
        rq, fq, mq = cell // 100, (cell // 10) % 10, cell % 10
        assert 1 <= rq <= 4 and 1 <= fq <= 4 and 1 <= mq <= 4
        total += r["n_customers"]
    # every customer lands in exactly one cell
    from incubator_horaedb_spark.querybank.registry import load

    n_cust = load(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert total == n_cust


def test_inflation_report_consistency(spark, qs):
    rows = qs["dedup_inflation_report"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_unique"] <= r["n_docs"]
        assert r["n_dup_docs"] == r["n_docs"] - r["n_unique"]
        assert r["inflation"] >= 1.0


# --- BPE merge application semantics ------------------------------------------


def _bpe_merge_model(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge (the loop from
    Sennrich et al. 2016's published implementation)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def test_bpe_apply_merge_matches_model():
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubator_horaedb_spark.operators.dialect import DUCK
    from incubator_horaedb_spark.operators.text import bpe_apply_merge

    con = duckdb.connect()

    @settings(max_examples=60, deadline=None)
    @given(
        word=st.text(alphabet="ab", min_size=2, max_size=12),
        pair=st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=2),
            st.text(alphabet="ab", min_size=1, max_size=2),
        ),
    )
    def run(word, pair):
        a, b = pair
        symbols = list(word)
        expr = bpe_apply_merge(DUCK, "ws", f"'{a}'", f"'{b}'")
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS ws) t", ["·".join(symbols)]
        ).fetchone()[0]
        assert got == "·".join(_bpe_merge_model(symbols, a, b)), (word, a, b, got)

    run()


def test_bpe_merges_deterministic_and_shaped(spark, qs):
    rows = qs["bpe_train_merges"](spark, SF_DIR).collect()
    assert len(rows) == 3
    by_round = {r["round"]: r for r in rows}
    assert sorted(by_round) == [1, 2, 3]
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"]
        assert r["pair_count"] > 0
    # argmax counts are monotone non-increasing across rounds: a merge can
    # only shrink existing pair counts, and every newly-created pair
    # (x, ab) / (ab, y) is bounded by the pre-merge (x, a) / (b, y) counts,
    # which were themselves <= the previous argmax
    assert by_round[1]["pair_count"] >= by_round[2]["pair_count"] >= by_round[3]["pair_count"]
    rows2 = qs["bpe_train_merges"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


# --- winnow decontamination / ACF / source divergence -------------------------


def test_winnow_decontam_shares_bounded(spark, qs):
    rows = qs["decontaminate_winnow"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0 < r["n_shared"] <= r["n_fp"]
        assert 0.0 < r["shared_fp_share"] <= 1.0
        assert r["doc_id"] % 97 != 0  # benchmark docs are never flagged


def test_winnow_decontam_detects_planted_substring(spark):
    # a training doc sharing a LONG token run with a benchmark doc is
    # guaranteed a shared fingerprint (w + k - 1 = 6-token runs suffice)
    import duckdb

    from incubator_horaedb_spark.operators.dialect import DUCK
    from incubator_horaedb_spark.operators.text import winnow_decontam_sql

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, bench_text),                                    # benchmark (0 % 97 == 0)
        (1, "unrelated words entirely different tokens here pad pad pad"),
        (2, "prefix noise alpha beta gamma delta epsilon zeta eta theta suffix"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = {r[0]: r for r in con.execute(winnow_decontam_sql(DUCK)).fetchall()}
    assert 2 in got  # the contaminated doc is flagged
    # doc 1 may appear with incidental low share or not at all, but doc 2
    # must dominate any doc-1 share
    if 1 in got:
        assert got[2][3] > got[1][3]


def test_acf_bounds_and_lags(spark, qs):
    rows = qs["ts_autocorrelation"](spark, SF_DIR).collect()
    assert rows
    by_series = {}
    for r in rows:
        assert r["lag"] in (1, 24)
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] > 0
        by_series.setdefault(r["event_type"], set()).add(r["lag"])
    for lags in by_series.values():
        assert lags == {1, 24}


def test_source_divergence_nonnegative(spark, qs):
    rows = qs["corpus_source_divergence"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # true KL >= 0; per-term dyadic quantization can dip a hair below
        assert r["kl_divergence"] >= -0.001
        assert r["n_distinct_tokens"] > 0


# --- promql_group_left (many-to-one vector matching) -------------------------


def test_group_left_shares_sum_to_one(spark, qs):
    rows = qs["promql_group_left"](spark, SF_DIR).collect()
    assert rows
    # group_left copied the info label onto every row
    assert all(r["owner"] == "team-" + r["event_type"][0] for r in rows)
    # per-ts shares sum to ~1 wherever the total was nonzero (the dyadic
    # 2^-20 quantization of the total introduces up to ~0.5% relative
    # error on very small rates — semantics, not a bug)
    by_ts = {}
    for r in rows:
        if r["share_of_total"] is not None:
            by_ts.setdefault(r["ts"], []).append(r["share_of_total"])
    assert by_ts
    for shares in by_ts.values():
        assert abs(sum(shares) - 1.0) < 0.02


def test_group_left_broadcasts_both_sides(spark, qs):
    plan = qs["promql_group_left"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


# --- set-op ALL variants -----------------------------------------------------


def test_intersect_all_multiset_semantics(spark, qs):
    from incubator_horaedb_spark.querybank.registry import load

    c = (
        load(spark, SF_DIR, "customer")
        .filter("c_acctbal > 9500")
        .groupBy("c_nationkey").count().collect()
    )
    s = load(spark, SF_DIR, "supplier").groupBy("s_nationkey").count().collect()
    cm = {r["c_nationkey"]: r["count"] for r in c}
    sm = {r["s_nationkey"]: r["count"] for r in s}
    got = {}
    for r in qs["set_intersect_all"](spark, SF_DIR).collect():
        got[r["nationkey"]] = got.get(r["nationkey"], 0) + 1
    want = {k: min(v, sm.get(k, 0)) for k, v in cm.items() if min(v, sm.get(k, 0)) > 0}
    assert got == want

    got_e = {}
    for r in qs["set_except_all"](spark, SF_DIR).collect():
        got_e[r["nationkey"]] = got_e.get(r["nationkey"], 0) + 1
    want_e = {k: v - sm.get(k, 0) for k, v in cm.items() if v - sm.get(k, 0) > 0}
    assert got_e == want_e


# --- ts_cross_correlation ----------------------------------------------------


def test_xcorr_bounded_and_symmetric_domain(spark, qs):
    rows = qs["ts_cross_correlation"](spark, SF_DIR).collect()
    assert rows
    lags = sorted(r["lag"] for r in rows)
    assert lags == sorted(set(lags)) and all(-3 <= l <= 3 for l in lags)
    for r in rows:
        if r["xcorr"] is not None:
            assert -1.0 - 1e-9 <= r["xcorr"] <= 1.0 + 1e-9
        assert r["n_pairs"] > 0


# --- dedup_dupspan_report ----------------------------------------------------


def test_dupspan_report_invariants(spark, qs):
    rows = qs["dedup_dupspan_report"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_docs_dup"] <= r["n_docs"]
        assert 0 <= r["n_docs_flagged"] <= r["n_docs_dup"]
        if r["mean_dup_cov"] is not None:
            # the dyadic quantization + floor-form output rounding can push
            # the mean one 1e-6 output ulp above the rounded max
            assert 0.0 <= r["mean_dup_cov"] <= r["max_dup_cov"] + 2e-6 <= 1.0 + 2e-6


def test_dupspan_detects_planted_shared_passage(spark):
    from incubator_horaedb_spark.operators import dedup
    from incubator_horaedb_spark.operators.dialect import SPARK as SP

    passage = " ".join(f"tok{i}" for i in range(12))  # 12 shared tokens > k=8
    docs = [
        (1, passage + " alpha beta gamma delta epsilon zeta eta theta", "en", "s1", 0),
        (2, "iota kappa lam mu nu xi omicron pi " + passage, "en", "s2", 0),
        (3, "one two three four five six seven eight nine ten eleven twelve", "en", "s3", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    out = {r["source"]: r for r in spark.sql(dedup.dupspan_report_sql(SP)).collect()}
    # both sharers have coverage; the 12-token passage yields 5 dup-gram
    # starts covering 12 of 20 tokens = 0.6 -> flagged
    assert out["s1"]["n_docs_dup"] == 1 and out["s2"]["n_docs_dup"] == 1
    assert out["s1"]["n_docs_flagged"] == 1
    assert abs(out["s1"]["mean_dup_cov"] - 0.6) < 1e-6
    # the unrelated doc has no dup coverage
    assert out["s3"]["n_docs_dup"] == 0 and out["s3"]["mean_dup_cov"] is None


# --- bpe_encode_corpus -------------------------------------------------------


def test_bpe_encode_compression_bounds(spark, qs):
    rows = qs["bpe_encode_corpus"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # merges only ever fuse symbols: tokens <= chars, and at least one
        # token per word
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert r["chars_per_token"] >= 1.0


# --- session_window_agg / drift_psi_report -----------------------------------


def test_session_window_matches_batch_sessionizer_count(spark, qs):
    # the native operator and the gaps-and-islands SQL must agree on the
    # session count (same 30-min gap); ends are last event + gap
    rows = qs["session_window_agg"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["session_end_ms"] > r["session_start_ms"]
        assert r["n_events"] >= 1
    plan = qs["session_window_agg"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # one shuffle (user key), no analytic window pass, no join
    assert "Join" not in plan and plan.count("Exchange") <= 2


def test_psi_zero_on_identical_halves(spark):
    from incubator_horaedb_spark.querybank.timeseries import _psi_sql
    from pyspark.sql import functions as F

    # identical distributions in both halves -> PSI ~ 0
    rows = [(float(v % 5) * 55.0, "t" + str(v % 3), h) for v in range(60) for h in (0, 1)]
    df = spark.createDataFrame(rows, "value double, event_type string, h int").select(
        "value", "event_type",
        F.timestamp_millis(F.when(F.col("h") == 0, 1705000000000).otherwise(1705400000000)).alias("ts"),
    )
    df.createOrReplaceTempView("events")
    out = {r["metric"]: r["psi"] for r in spark.sql(_psi_sql("spark")).collect()}
    assert abs(out["value"]) < 1e-5 and abs(out["event_type"]) < 1e-5


# --- embedding_mrl_truncation ------------------------------------------------


def test_mrl_recall_bounded_and_self_consistent(spark, qs):
    rows = qs["embedding_mrl_truncation"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"] == 5


def test_duck_dot_handles_short_vectors():
    # regression: the oracle's fold must iterate the ACTUAL list length,
    # not a fixed 1..DIM range (NULL products past the end of truncated
    # vectors nulled the whole sum)
    import duckdb

    from incubator_horaedb_spark.operators.dialect import DUCK
    from incubator_horaedb_spark.operators.similarity import _dot

    got = duckdb.connect().execute(
        f"SELECT {_dot(DUCK, 'a', 'a')} FROM (SELECT [1.0, 2.0, 3.0] AS a)"
    ).fetchone()[0]
    assert got == 14.0


# --- hybrid_rrf_fusion / unpivot_metrics -------------------------------------


def test_rrf_fusion_scores_and_ranks(spark, qs):
    rows = qs["hybrid_rrf_fusion"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        # every fused doc came from at least one retriever's top-20
        assert r["bm25_rank"] is not None or r["emb_rank"] is not None
        # score equals the RRF formula recomputed from the reported ranks
        want = 0.0
        if r["bm25_rank"] is not None:
            want += 1.0 / (60.0 + r["bm25_rank"])
        if r["emb_rank"] is not None:
            want += 1.0 / (60.0 + r["emb_rank"])
        assert abs(r["rrf_score"] - want) < 2e-6


def test_unpivot_shape(spark, qs):
    rows = qs["unpivot_metrics"](spark, SF_DIR).collect()
    flags = {r["l_returnflag"] for r in rows}
    # 3 metrics per flag, long format
    assert len(rows) == 3 * len(flags)
    assert {r["metric"] for r in rows} == {"qty", "n_rows", "price_cents"}


# --- ts_correlation_matrix / dedup_graph_pagerank ----------------------------


def test_corr_matrix_pairs_and_bounds(spark, qs):
    rows = qs["ts_correlation_matrix"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # upper triangle only
        assert r["n_hours"] > 0
        if r["corr"] is not None:
            assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9


def test_pagerank_path_graph_center_wins(spark):
    from incubator_horaedb_spark.operators import dedup
    from incubator_horaedb_spark.operators.dialect import SPARK as SP

    # path graph 1-2-3: the center node gets the highest PageRank
    spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    ).createOrReplaceTempView("__t_edges")
    sql = SP.cte_query(
        dedup.pagerank_ctes(SP, "__t_edges", pfx="t_"),
        dedup.pagerank_final_select(SP, f"t_pr{dedup.PR_ROUNDS}", k=3),
    )
    rows = spark.sql(sql).collect()
    assert [r["doc_id"] for r in rows] == [2, 1, 3] or [r["doc_id"] for r in rows] == [2, 3, 1]
    assert rows[0]["degree"] == 2
    # mass conservation: symmetric graph, no dangling nodes
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-3


def test_pagerank_corpus_invariants(spark, qs):
    rows = qs["dedup_graph_pagerank"](spark, SF_DIR).collect()
    if not rows:  # no near-dup edges at this SF is legitimate
        return
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    prs = [r["pagerank"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    for r in rows:
        assert r["degree"] >= 1 and r["pagerank"] > 0


# --- parsed PromQL binary expressions ------------------------------------------


def test_parse_binexpr_shapes():
    from incubator_horaedb_spark.frontends.promql import BinExpr, parse_promql

    b = parse_promql(
        "rate(events[2h]) / on() group_left sum(rate(events[2h]))", extended=True
    )
    assert isinstance(b, BinExpr) and b.op == "/" and b.on == [] and b.group_left
    assert b.lhs.range_fn == "rate" and b.rhs.agg_op == "sum"

    b2 = parse_promql(
        'rate(m{t="a"}[5m]) * ignoring(t) rate(m{t="b"}[5m])', extended=True
    )
    assert b2.ignoring == ["t"] and b2.op == "*" and not b2.group_left

    # default grammar still rejects binary expressions (reference parity)
    import pytest as _pt

    with _pt.raises(ValueError):
        parse_promql("rate(m[5m]) / rate(n[5m])")


def test_parsed_share_sums_to_one(spark, qs):
    rows = qs["promql_parsed_share"](spark, SF_DIR).collect()
    assert rows
    by_ts = {}
    for r in rows:
        if r["value"] is not None:
            by_ts.setdefault(r["ts"], []).append(r["value"])
    assert by_ts
    for shares in by_ts.values():
        assert abs(sum(shares) - 1.0) < 0.02


# --- multimodal_exif_meta ----------------------------------------------------


def test_exif_round_trip_both_byte_orders():
    from incubator_horaedb_spark.operators.multimodal import (
        parse_exif,
        synth_jpeg_exif_payload,
    )

    for mid in (0, 1, 8, 27, 99, 100, 4095):
        bo, orient, xres, day = parse_exif(synth_jpeg_exif_payload(mid))
        assert bo == ("II" if mid % 2 == 0 else "MM")
        assert orient == 1 + mid % 8
        assert xres == 72 + mid % 100
        assert day == 1 + mid % 28


def test_exif_parser_rejects_garbage():
    from incubator_horaedb_spark.operators.multimodal import parse_exif

    assert parse_exif(b"") == (None, None, None, None)
    assert parse_exif(b"\xff\xd8\xff\xd9") == (None, None, None, None)
    # APP1 that is not Exif
    assert parse_exif(b"\xff\xd8\xff\xe1\x00\x08notex\xff\xd9") == (
        None, None, None, None,
    )


# --- ann_refine_rerank -------------------------------------------------------


def test_refine_ranks_exact_and_bounded(spark, qs):
    rows = qs["ann_refine_rerank"](spark, SF_DIR).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for q, lst in by_q.items():
        assert len(lst) <= 5
        assert [r["rnk"] for r in lst] == list(range(1, len(lst) + 1))
        dists = [r["exact_dist"] for r in lst]
        assert dists == sorted(dists)
        assert all(r["vec_id"] != q for r in lst)


# --- sample_topk_per_group / influxql metadata -------------------------------


def test_topk_per_group_exact_k_and_stable(spark, qs):
    rows = qs["sample_topk_per_group"](spark, SF_DIR).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, lst in by_src.items():
        assert len(lst) <= 5
        assert [r["hrank"] for r in sorted(lst, key=lambda r: r["hrank"])] == list(
            range(1, len(lst) + 1)
        )
    # deterministic: second run picks the identical sample
    rows2 = qs["sample_topk_per_group"](spark, SF_DIR).collect()
    assert {(r["source"], r["doc_id"]) for r in rows} == {
        (r["source"], r["doc_id"]) for r in rows2
    }


def test_influxql_metadata_dispatch(spark):
    from incubator_horaedb_spark.frontends.influxql import influxql_metadata
    from incubator_horaedb_spark.querybank.registry import load

    ev = load(spark, SF_DIR, "events")
    tables = {"events": ev}
    assert influxql_metadata("SHOW MEASUREMENTS", tables) == ["events"]
    fk = influxql_metadata('SHOW FIELD KEYS FROM "events"', tables)
    assert ("value", "float") in fk and ("event_id", "integer") in fk
    assert influxql_metadata('SELECT * FROM "events"', tables) is None
    import pytest as _pt

    with _pt.raises(ValueError):
        influxql_metadata('SHOW TAG VALUES FROM "events" WITH KEY = "nope"', tables)


# --- tsz_xor_compression -----------------------------------------------------


def test_xor_bits_model_hand_computed():
    # bit-length arithmetic check against a hand-computed case via DuckDB
    import duckdb

    from incubator_horaedb_spark.querybank.timeseries import _xor_sql

    con = duckdb.connect()
    # series with values 1.0, 1.0 (zero XOR -> 1 bit), then 2.0:
    # q(1.0)=1024, q(2.0)=2048; xor(1024,2048)=3072=0b110000000000
    # span = bl(3072)=12 minus bl(lowest=1024)=11 plus 1 = 2 -> bits 15
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "('a', 1.0, TIMESTAMP '2024-01-01 00:00:00', 1),"
        "('a', 1.0, TIMESTAMP '2024-01-01 00:01:00', 2),"
        "('a', 2.0, TIMESTAMP '2024-01-01 00:02:00', 3)"
        ") t(event_type, value, ts, event_id)"
    )
    r = con.execute(_xor_sql("duckdb")).fetchall()
    assert r == [("a", 2, 1, 2, 8.0, 8.0)]
    # n_deltas=2, zero-xor=1 (1 bit), changed (15 bits) -> avg 8, ratio 64*2/16=8


def test_xor_compression_invariants(spark, qs):
    rows = qs["tsz_xor_compression"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_zero_xor"] <= r["n_deltas"]
        assert 1.0 <= r["est_bits_per_value"] <= 64.0
        assert r["compression_ratio"] >= 1.0


# --- LATERAL / WITHIN GROUP / listagg ----------------------------------------


def test_lateral_decorrelated_to_ranked_join(spark, qs):
    df = qs["lateral_topk_per_key"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst decorrelates the LATERAL — no nested-loop per-row execution
    assert "CartesianProduct" not in plan
    rows = df.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["c_custkey"], []).append(r["totalprice"])
    for k, prices in per_key.items():
        assert len(prices) <= 2
        assert prices == sorted(prices, reverse=True)


def test_percentile_disc_returns_actual_elements(spark, qs):
    from incubator_horaedb_spark.querybank.registry import load

    rows = qs["percentile_disc_group"](spark, SF_DIR).collect()
    vals = {
        r["o_orderstatus"]: (r["p25"], r["p50"], r["p75"]) for r in rows
    }
    orders = load(spark, SF_DIR, "orders").select("o_orderstatus", "o_totalprice").collect()
    by_status = {}
    for r in orders:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    for st, (p25, p50, p75) in vals.items():
        pool = set(by_status[st])
        assert {p25, p50, p75} <= pool  # discontinuous: actual elements
        assert p25 <= p50 <= p75


def test_string_agg_name_ordered(spark, qs):
    rows = qs["string_agg_ordered"](spark, SF_DIR).collect()
    assert len(rows) == 5  # TPC-H regions
    for r in rows:
        parts = r["nations"].split(",")
        assert parts == sorted(parts)
        assert len(parts) == r["n_nations"]


# --- doc_cluster_quality -----------------------------------------------------


def test_cluster_quality_silhouette_bounds(spark, qs):
    rows = qs["doc_cluster_quality"](spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_members"] for r in rows)
    assign = qs["doc_cluster_assign"](spark, SF_DIR).collect()
    assert total == sum(r["n_members"] for r in assign)
    for r in rows:
        # d1 <= d2 by construction -> simplified silhouette in [0, 1]
        assert -1e-9 <= r["mean_silhouette"] <= 1.0 + 1e-9
        assert r["mean_d1"] >= 0.0


def test_binop_splitter_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubator_horaedb_spark.frontends.promql import _split_top_level_binop

    # operands: balanced expressions with NO top-level operator; operator
    # chars may appear inside braces/brackets/parens (matcher values,
    # durations, nested calls) and must never split there
    operand = st.sampled_from([
        'rate(events[2h])',
        'sum(rate(events[5m]))',
        'events{event_type="a+b-c"}',
        'clamp(events, -1, 2)',
        'max_over_time(rate(m[2h])[1h:5m])',
        'irate(m{x="1/2"}[30s])',
    ])
    op = st.sampled_from(list("+-*/"))
    clause = st.sampled_from(["", "on() ", "ignoring(a, b) ", "on(x) group_left ",
                              "group_left() "])

    @settings(max_examples=80, deadline=None)
    @given(lhs=operand, o=op, cl=clause, rhs=operand)
    def run(lhs, o, cl, rhs):
        got = _split_top_level_binop(f"{lhs} {o} {cl}{rhs}")
        assert got is not None
        glhs, gop, gcl, grhs = got
        assert glhs == lhs and gop == o and grhs == rhs
        assert gcl == cl.strip()
        # operands alone never split
        assert _split_top_level_binop(lhs) is None
        assert _split_top_level_binop(rhs) is None

    run()


def test_seasonal_decompose_bounds(spark, qs):
    rows = qs["ts_seasonal_decompose"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["seasonal_strength"] <= 1.0 + 1e-9
        assert 0 <= r["peak_dow"] <= 6
        assert r["n_days"] >= 7


def test_market_basket_lift_recomputable(spark, qs):
    rows = qs["market_basket_pairs"](spark, SF_DIR).collect()
    if not rows:  # tiny SFs can have no pair with support >= 2
        return
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    from incubator_horaedb_spark.querybank.registry import load

    n_orders = load(spark, SF_DIR, "lineitem").select("l_orderkey").distinct().count()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 2 <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        want = r["n_ab"] * n_orders / (r["n_a"] * r["n_b"])
        assert abs(r["lift"] - want) < 1e-5


# --- line-protocol escape property test --------------------------------------


def test_line_protocol_escapes_round_trip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubator_horaedb_spark.frontends.influxql import parse_line_protocol

    # tag values may contain escaped spaces/commas/equals; string field
    # values live in quotes with escaped quotes
    tagval = st.text(alphabet="ab ,=", min_size=1, max_size=8)
    strval = st.text(alphabet='xy"z', min_size=0, max_size=8)
    num = st.integers(min_value=-1000, max_value=1000)

    def esc_tag(s: str) -> str:
        return s.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")

    @settings(max_examples=60, deadline=None)
    @given(tv=tagval, sv=strval, n=num)
    def run(tv, sv, n):
        line = (
            f"m,host={esc_tag(tv)} "
            f'v={n}i,s="{sv.replace(chr(92), "").replace(chr(34), chr(92) + chr(34))}" '
            f"1700000000000000000"
        )
        rows = parse_line_protocol(line)["m"]
        assert len(rows) == 1
        r = rows[0]
        assert r["host"] == tv
        assert r["v"] == n
        assert r["s"] == sv.replace("\\", "").replace('"', '"')

    run()


def test_psi_detects_planted_drift(spark):
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.querybank.timeseries import _psi_sql

    # first half: values near 0; second half: values near 450 — hard drift
    rows = [(5.0 if h == 0 else 455.0, "t" + str(v % 2), h) for v in range(80) for h in (0, 1)]
    df = spark.createDataFrame(rows, "value double, event_type string, h int").select(
        "value", "event_type",
        F.timestamp_millis(
            F.when(F.col("h") == 0, 1705000000000).otherwise(1705400000000)
        ).alias("ts"),
    )
    df.createOrReplaceTempView("events")
    out = {r["metric"]: r["psi"] for r in spark.sql(_psi_sql("spark")).collect()}
    assert out["value"] > 0.5  # far beyond the 0.2 action threshold
    assert abs(out["event_type"]) < 1e-5  # categorical mix unchanged


# --- review fixes: binop precedence/quotes, group_left labels, guards --------


def test_binop_precedence_and_associativity():
    from incubator_horaedb_spark.frontends.promql import BinExpr, parse_promql

    # * binds tighter than +: a * b + c = (a*b) + c
    b = parse_promql(
        "rate(a[5m]) * rate(b[5m]) + rate(c[5m])", extended=True
    )
    assert b.op == "+" and isinstance(b.lhs, BinExpr) and b.lhs.op == "*"
    assert not isinstance(b.rhs, BinExpr)
    # left associativity: a - b + c = (a-b) + c
    b2 = parse_promql(
        "rate(a[5m]) - rate(b[5m]) + rate(c[5m])", extended=True
    )
    assert b2.op == "+" and isinstance(b2.lhs, BinExpr) and b2.lhs.op == "-"


def test_binop_split_ignores_quoted_metacharacters():
    from incubator_horaedb_spark.frontends.promql import BinExpr, parse_promql

    b = parse_promql(
        'rate(m{path="/a(b"}[5m]) / rate(n{q="x)y"}[5m])', extended=True
    )
    assert isinstance(b, BinExpr) and b.op == "/"
    assert b.lhs.selector.metric == "m" and b.rhs.selector.metric == "n"


def test_group_left_label_copy(spark):
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.frontends.promql import promql_to_df

    df = spark.createDataFrame(
        [("a", "t1", 1_000, 2.0), ("b", "t2", 1_000, 3.0)],
        "host string, owner string, ms long, value double",
    ).select("host", "owner", F.timestamp_millis("ms").alias("ts"), "value")
    out = promql_to_df(
        "m * on(host) group_left(owner) m",
        {"m": df},
        start_ms=1_000, end_ms=1_000, step_ms=1_000,
        tag_cols=["host"],  # owner is the info label, not a match key
        extended=True,
    ).collect()
    got = {(r["host"], r["owner"], r["value"]) for r in out}
    assert got == {("a", "t1", 4.0), ("b", "t2", 9.0)}


def test_binop_on_missing_label_raises(spark):
    from pyspark.sql import functions as F

    import pytest as _pt

    from incubator_horaedb_spark.frontends.promql import promql_to_df

    df = spark.createDataFrame(
        [("a", 1_000, 2.0)], "host string, ms long, value double"
    ).select("host", F.timestamp_millis("ms").alias("ts"), "value")
    with _pt.raises(ValueError, match="not present on"):
        promql_to_df(
            "m * on(nolabel) m", {"m": df},
            start_ms=1_000, end_ms=1_000, step_ms=1_000,
            tag_cols=["host"], extended=True,
        )


def test_opentsdb_rate_with_none_aggregator_raises(spark):
    import pytest as _pt

    from incubator_horaedb_spark.frontends.opentsdb import (
        parse_query_request,
        query_to_dfs,
    )
    from incubator_horaedb_spark.querybank.registry import load

    req = parse_query_request(
        {"start": 0, "end": 2_000_000_000_000,
         "queries": [{"metric": "events", "aggregator": "none", "rate": True}]}
    )
    ev = load(spark, SF_DIR, "events")
    with _pt.raises(ValueError, match="rate with aggregator"):
        query_to_dfs(ev, req)


def test_exif_truncated_tiff_degrades_to_nones():
    import struct

    from incubator_horaedb_spark.operators.multimodal import parse_exif

    # valid Exif APP1 prologue, truncated before the IFD
    body = b"Exif\x00\x00II" + struct.pack("<HI", 42, 8)
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif(b"\xff\xd8" + app1 + b"\xff\xd9") == (None, None, None, None)
    # ifd0 offset pointing past the segment
    body2 = b"Exif\x00\x00MM" + struct.pack(">HI", 42, 9999)
    app2 = b"\xff\xe1" + struct.pack(">H", len(body2) + 2) + body2
    assert parse_exif(b"\xff\xd8" + app2 + b"\xff\xd9") == (None, None, None, None)


def test_threshold_sweep_monotone_and_consistent(spark, qs):
    rows = {r["band_lo_pct"]: r for r in qs["dedup_threshold_sweep"](spark, SF_DIR).collect()}
    if not rows:
        return
    for band, r in rows.items():
        assert r["n_pairs"] >= 1
        # a pair touches 2 docs; distinct docs <= 2 * pairs
        assert r["n_docs_touched"] <= 2 * r["n_pairs"]
    # the >= 0.8 bands together must equal dedup_minhash_lsh's pair count
    lsh_pairs = qs["dedup_minhash_lsh"](spark, SF_DIR).count()
    high = sum(r["n_pairs"] for b, r in rows.items() if b >= 80)
    assert high == lsh_pairs


def test_stickiness_bounds_and_window(spark, qs):
    rows = qs["dau_wau_stickiness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # DAU is a subset of the trailing-7-day actives
        assert 0 < r["n_dau"] <= r["n_wau"]
        assert 0.0 < r["stickiness"] <= 1.0 + 1e-9
    days = [r["epoch_day"] for r in rows]
    assert days == sorted(days)


def test_not_in_null_semantics(spark, qs):
    r = qs["subquery_not_in_null_semantics"](spark, SF_DIR).collect()[0]
    # a NULL in the IN-list makes NOT IN never TRUE (three-valued logic)
    assert r["n_with_nulls"] == 0
    # the null-filtered variant counts normally and differs
    assert 0 < r["n_without_nulls"] <= r["n_suppliers"]
