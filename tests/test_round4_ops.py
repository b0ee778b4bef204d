"""Round-4 LLM-pipeline operators: plan-shape and semantic invariants.

Covers the four new gated queries (dedup_edit_distance,
split_leakage_check, pack_sequences, bpe_pair_counts).  Cross-engine value
equality is the oracle harness's job; these tests pin the SCALE claims in
the operator docstrings (no cartesian products, block caps honored,
packing invariants) against the actual physical plans and results.
"""

from __future__ import annotations

import pytest

from incubator_horaedb_spark.functions import timeutil
from incubator_horaedb_spark.plans.inspect import explain_str
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank import llm_ops  # noqa: F401 - registers


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def test_edit_distance_is_blocked_equi_join(spark, sf_dir, qs):
    df = qs["dedup_edit_distance"](spark, sf_dir)
    text = explain_str(df, "simple")
    # candidates come from the (blk, lb) equi-join — never a cartesian
    assert "CartesianProduct" not in text, text
    assert "SortMergeJoin" in text or "BroadcastHashJoin" in text or "ShuffledHashJoin" in text, text
    rows = df.collect()
    assert rows, "test corpus contains known near-dup pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["edit_dist"] <= 8


def test_split_leakage_matrix_is_bounded(spark, sf_dir, qs):
    df = qs["split_leakage_check"](spark, sf_dir)
    rows = df.collect()
    # at most 6 unordered split pairs over {train, val, test}
    assert 0 < len(rows) <= 6
    for r in rows:
        assert r["split_lo"] <= r["split_hi"]
        assert r["n_leaked_pairs"] > 0


def test_pack_sequences_invariants(spark, sf_dir, qs):
    df = qs["pack_sequences"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert "CartesianProduct" not in text and "Join" not in text, text
    rows = df.collect()
    assert rows
    from collections import defaultdict

    by_stream = defaultdict(list)
    for r in rows:
        by_stream[(r["source"], r["shard"])].append(r)
    from incubator_horaedb_spark.operators.pipeline import PACK_CAPACITY

    for stream, bins in by_stream.items():
        ids = sorted(b["bin_id"] for b in bins)
        # next-fit bins are contiguous from 0 within each stream
        assert ids == list(range(len(ids))), (stream, ids)
        for b in bins:
            # a bin stops accepting docs once it crosses capacity, so it
            # can exceed capacity only by the tokens of its final doc —
            # and every non-final bin must have crossed the threshold
            if b["bin_id"] < len(ids) - 1:
                assert b["bin_tokens"] >= PACK_CAPACITY - 0, (stream, b)


def test_bpe_pairs_are_char_bigrams(spark, sf_dir, qs):
    rows = qs["bpe_pair_counts"](spark, sf_dir).collect()
    assert len(rows) == 30
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r["pair"]) == 2


def test_bigram_surprisal_semantics(spark, sf_dir, qs):
    rows = qs["text_bigram_surprisal"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # surprisal of p in (0, 1] is >= 0; n_bigrams = tokens - 1 > 0
        assert r["mean_bigram_surprisal"] >= 0
        assert r["n_bigrams"] >= 1


def test_power_iteration_unit_norm_and_dominance(spark, sf_dir, qs):
    import math

    rows = qs["embedding_power_iteration"](spark, sf_dir).collect()
    assert len(rows) == 64
    v = {r["dim"]: r["component"] for r in rows}
    nrm = math.sqrt(sum(c * c for c in v.values()))
    assert abs(nrm - 1.0) < 1e-4  # normalized (up to quantization grid)
    # the result is a genuine direction, not the uniform start vector
    assert max(abs(c) for c in v.values()) > 0.14


def test_containment_asymmetric_semantics(spark, sf_dir, qs):
    from incubator_horaedb_spark.operators.dedup import CONTAINMENT_THRESHOLD

    rows = qs["dedup_containment"](spark, sf_dir).collect()
    assert rows
    jac = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])): r["jaccard"]
        for r in qs["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r["containment"] >= CONTAINMENT_THRESHOLD
        key = (min(r["doc_small"], r["doc_big"]), max(r["doc_small"], r["doc_big"]))
        if key in jac:
            # containment >= jaccard always (divides by the smaller set)
            assert r["containment"] >= jac[key] - 1e-6


def test_tfidf_topk_shape(spark, sf_dir, qs):
    rows = qs["text_tfidf_topk"](spark, sf_dir).collect()
    assert rows
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in rows)
    assert max(per_doc.values()) <= 3
    for r in rows:
        assert r["tfidf"] >= 0 and len(r["term"]) >= 2


def test_abtt_reduces_norms(spark, sf_dir, qs):
    rows = qs["embedding_abtt_postprocess"](spark, sf_dir).collect()
    assert rows
    import statistics

    before = statistics.mean(r["nrm_before"] for r in rows)
    after = statistics.mean(r["nrm_after"] for r in rows)
    # removing the top principal direction strictly shrinks mean norm
    assert after < before
    for r in rows:
        assert r["nrm_after"] <= r["nrm_before"] + 1e-6


def test_nearest_join_picks_closer_side(spark, sf_dir, qs):
    rows = qs["nearest_join_events"](spark, sf_dir).collect()
    assert rows
    asof = {
        (r["user_id"], r["purchase_t"]): r["signup_t"]
        for r in qs["asof_join_events"](spark, sf_dir).collect()
    }
    tol = 2 * 3600 * 1000
    closer = 0
    for r in rows:
        if r["signup_t"] is None:
            continue
        assert abs(r["signup_t"] - r["purchase_t"]) <= tol
        back = asof.get((r["user_id"], r["purchase_t"]))
        if back is not None and r["signup_t"] != back:
            # nearest deviates from as-of only when the forward row is
            # strictly closer than the backward one
            assert r["purchase_t"] - back > r["signup_t"] - r["purchase_t"] > 0
            closer += 1
    assert closer > 0  # the corpus exercises the forward branch


def test_promql_subquery_window_is_range_max(spark, sf_dir, qs):
    rows = qs["promql_subquery_max_rate"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r["ts"])
        for i, r in enumerate(rs):
            lo = timeutil.epoch_ms(r["ts"]) - 3600_000
            window = [
                x["value"]
                for x in rs
                if lo <= timeutil.epoch_ms(x["ts"]) <= timeutil.epoch_ms(r["ts"])
            ]
            assert abs(r["max_1h"] - max(window)) < 1e-9
        break  # one series is enough for the O(n^2) re-derivation


def test_promql_binary_ops_match_semantics(spark, sf_dir, qs):
    rows = qs["promql_binary_vector_ops"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["click_rate"] == 0:
            assert r["error_ratio"] is None  # guarded division
        else:
            assert abs(r["error_ratio"] - round(r["err_rate"] / r["click_rate"], 6)) < 2e-6
        assert abs(r["combined"] - round(r["err_rate"] + r["click_rate"], 6)) < 2e-6


def test_promql_agg_quantile_bounds(spark, sf_dir, qs):
    qrows = qs["promql_agg_quantile"](spark, sf_dir).collect()
    assert qrows
    for r in qrows:
        assert r["q90"] is not None and r["q90"] >= 0


def test_window_value_family_semantics(spark, sf_dir, qs):
    rows = qs["window_value_family"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    from incubator_horaedb_spark.querybank.registry import load

    # independent model: per user, first/last event_id under (ts, event_id)
    # order — the window's declared ordering
    ev = (
        load(spark, sf_dir, "events")
        .filter("user_id % 50 = 1")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    order = defaultdict(list)
    for r in ev:
        order[r["user_id"]].append((r["ts"], r["event_id"]))
    expected_first = {u: min(v)[1] for u, v in order.items()}
    expected_last = {u: max(v)[1] for u, v in order.items()}

    parts = defaultdict(list)
    for r in rows:
        parts[r["user_id"]].append(r)
    assert set(parts) == set(order)
    for uid, rs in parts.items():
        for r in rs:
            assert r["first_ev"] == expected_first[uid]
            assert r["last_ev"] == expected_last[uid]
        firsts = {r["first_ev"] for r in rs}
        lasts = {r["last_ev"] for r in rs}
        assert len(firsts) == 1 and len(lasts) == 1  # full-partition frame


def test_edit_survivors_consistent_with_pairs(spark, sf_dir, qs):
    survivors = {r["doc_id"] for r in qs["dedup_edit_survivors"](spark, sf_dir).collect()}
    pairs = qs["dedup_edit_distance"](spark, sf_dir).collect()
    assert survivors
    # every near-dup pair lost at least one member (they share a cluster,
    # whose single representative is the min id)
    for p in pairs:
        assert not (p["doc_a"] in survivors and p["doc_b"] in survivors)
    # nothing outside the paired docs was dropped
    from incubator_horaedb_spark.querybank.registry import load

    all_ids = {r["doc_id"] for r in load(spark, sf_dir, "documents").select("doc_id").collect()}
    paired = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert all_ids - paired <= survivors


def test_seasonal_profile_grid(spark, sf_dir, qs):
    rows = qs["seasonal_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
    # a month of uniform synthetic events covers the full weekly grid
    assert len({(r["event_type"], r["dow"], r["hour"]) for r in rows}) == len(rows)


def test_anomaly_mad_is_robust_flagging(spark, sf_dir, qs):
    rows = qs["anomaly_mad"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["value"] - r["series_median"]) > 6.0 * r["mad"] - 1e-6
        assert r["mad"] > 0


def test_dod_compression_bit_budget(spark, sf_dir, qs):
    rows = qs["tsz_dod_compression"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Gorilla bits/sample lies in [1, 36] by construction
        assert 1.0 <= r["avg_bits_per_sample"] <= 36.0
        assert r["total_bits"] >= r["n_samples"]


def test_ivf_medoids_are_cluster_members(spark, sf_dir, qs):
    med = qs["ivf_medoids"](spark, sf_dir).collect()
    assert med
    from collections import Counter

    per_cluster = Counter(r["cid"] for r in med)
    assert max(per_cluster.values()) <= 2
    for r in med:
        assert -1.0 <= r["cos"] <= 1.0 + 1e-9
        assert r["rnk"] in (1, 2)


def test_budget_select_respects_budget(spark, sf_dir, qs):
    from incubator_horaedb_spark.operators.pipeline import SELECT_BUDGET_TOKENS

    rows = qs["corpus_budget_select"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= r["n_docs"]
        # kept total exceeds budget by at most the final straddling doc
        assert r["kept_tokens"] >= 0
        if r["n_kept"] < r["n_docs"]:
            # budget was binding: the running total before the last kept
            # doc was < budget, so kept_tokens < budget + max doc size
            assert r["kept_tokens"] < SELECT_BUDGET_TOKENS + 2000


def test_degree_histogram_counts_pairs(spark, sf_dir, qs):
    hist = qs["dedup_degree_histogram"](spark, sf_dir).collect()
    pairs = qs["dedup_edit_distance"](spark, sf_dir).collect()
    assert hist
    # sum(degree * n_docs) counts each undirected pair twice
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * len(pairs)


def test_langid_confusion_shares_sum_to_one(spark, sf_dir, qs):
    rows = qs["text_langid_confusion"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    shares = defaultdict(float)
    for r in rows:
        shares[r["actual_lang"]] += r["share_of_actual"]
    for lang, total in shares.items():
        assert abs(total - 1.0) < 1e-3, (lang, total)


def test_activity_percentiles_ordered(spark, sf_dir, qs):
    (r,) = qs["user_activity_percentiles"](spark, sf_dir).collect()
    assert r["n_users"] > 0
    assert r["p50"] <= r["p90"] <= r["p99"]


def test_time_to_conversion_buckets(spark, sf_dir, qs):
    rows = qs["time_to_conversion"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["days_to_convert"] >= -1
        assert r["n_users"] > 0


def test_transition_matrix_probabilities(spark, sf_dir, qs):
    rows = qs["event_transition_matrix"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        assert r["n"] > 0
        by_from[r["from_type"]] += r["p_transition"]
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-3, (ft, total)


def test_cross_source_consistent_with_pairs(spark, sf_dir, qs):
    mat = qs["dedup_cross_source"](spark, sf_dir).collect()
    pairs = qs["dedup_edit_distance"](spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in mat) == len(pairs)
    for r in mat:
        assert r["source_lo"] <= r["source_hi"]
        if r["source_lo"] == r["source_hi"]:
            assert r["n_cross"] == 0
        else:
            assert r["n_cross"] == r["n_pairs"]


def test_distance_histogram_covers_sample_pairs(spark, sf_dir, qs):
    rows = qs["embedding_distance_histogram"](spark, sf_dir).collect()
    assert rows
    n = sum(r["n_pairs"] for r in rows)
    assert n == 100 * 99 // 2  # all sample pairs binned exactly once
    for r in rows:
        assert 0 <= r["bin"] <= 19 and -1.0 <= r["bin_lo"] < 1.0


def test_wow_delta_matches_component_series(spark, sf_dir, qs):
    rows = qs["promql_wow_delta"](spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert abs(r["wow_delta"] - round(r["rate_now"] - r["rate_week_ago"], 6)) < 2e-6
