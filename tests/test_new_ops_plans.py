"""Plan-shape assertions for the round-2 pipeline operators: the scale
claims in their docstrings (shuffle counts, codegen, top-k) hold in the
actual physical plans, not just in prose (SURVEY §7.5 property-testing
strategy)."""

from __future__ import annotations

import re

import pytest

from incubator_horaedb_spark.plans.inspect import explain_str, uses_top_k
from incubator_horaedb_spark.querybank import registry
from incubator_horaedb_spark.querybank.llm_ops import *  # noqa: F401,F403 - registers queries


def _exchanges(df) -> int:
    # count distinct Exchange operators; AQE may label them AQEShuffleRead
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", text))


@pytest.fixture(scope="module")
def qs():
    return {n: e.fn for n, e in registry.QUERIES.items()}


def test_sessionize_single_shuffle(spark, sf_dir, qs):
    # both window passes and the final agg are user-keyed: ONE hash exchange
    df = qs["sessionize_events"](spark, sf_dir)
    assert _exchanges(df) == 1, explain_str(df, "simple")


def test_corpus_shuffle_is_top_k(spark, sf_dir, qs):
    # ORDER BY + LIMIT plans as TakeOrderedAndProject, not a global sort
    df = qs["corpus_shuffle"](spark, sf_dir)
    assert uses_top_k(df)


def test_pii_scrub_no_shuffle(spark, sf_dir, qs):
    # pure map-side regex expressions — zero exchanges
    df = qs["pii_scrub"](spark, sf_dir)
    assert _exchanges(df) == 0


def test_doc_chunking_no_shuffle(spark, sf_dir, qs):
    # explode-per-chunk stays map-side — zero exchanges
    df = qs["doc_chunking"](spark, sf_dir)
    assert _exchanges(df) == 0


def test_split_assign_single_shuffle(spark, sf_dir, qs):
    # hash-split assignment is a pure projection; only the audit agg
    # shuffles (partial/final on (source, split))
    df = qs["corpus_split_assign"](spark, sf_dir)
    assert _exchanges(df) == 1, explain_str(df, "simple")


def test_ttr_no_shuffle(spark, sf_dir, qs):
    # per-doc token diversity is a projection — zero exchanges
    df = qs["text_ttr"](spark, sf_dir)
    assert _exchanges(df) == 0


def test_ngram_topk_is_top_k(spark, sf_dir, qs):
    # one bigram-keyed count shuffle, then TakeOrdered — never a global sort
    df = qs["text_ngram_topk"](spark, sf_dir)
    assert uses_top_k(df)
    assert _exchanges(df) <= 2, explain_str(df, "simple")


def test_paragraph_dedup_bounded_shuffles(spark, sf_dir, qs):
    # explode → hash-keyed count-distinct: the distinct rewrite costs at
    # most two hash exchanges; never a join, never a cartesian
    df = qs["dedup_paragraphs"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert _exchanges(df) <= 2, text
    assert "Join" not in text and "CartesianProduct" not in text


def test_rank_family_single_shuffle(spark, sf_dir, qs):
    # four window functions share ONE named WINDOW → one user-keyed exchange
    df = qs["window_rank_family"](spark, sf_dir)
    assert _exchanges(df) == 1, explain_str(df, "simple")


def test_order_nulls_is_top_k(spark, sf_dir, qs):
    # ORDER BY ... LIMIT plans as TakeOrderedAndProject, no global sort
    df = qs["order_nulls_explicit"](spark, sf_dir)
    assert uses_top_k(df)


def test_repetition_shuffles_are_doc_keyed(spark, sf_dir, qs):
    # (doc, bigram) agg then per-doc agg — both keyed by doc_id; at most
    # two exchanges and no broadcast-nested-loop anywhere
    df = qs["text_repetition"](spark, sf_dir)
    text = explain_str(df, "simple")
    assert _exchanges(df) <= 2, text
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_partitioned_scan_prune_partition_filters(spark, sf_dir, qs):
    """r8 (VERDICT r07 #7): the key-partitioned + segmented read must
    prune BOTH directory dimensions at the scan — `__partition IN (...)`
    from the tag-equality filter and `__segment` bounds from the time
    range appear in the FileSourceScan's PartitionFilters (the Spark
    rendering of query-plan.sql:38-66's "should not include SST"), and
    the row-exact timestamp predicate reaches PushedFilters."""
    df = qs["partitioned_scan_prune"](spark, sf_dir)
    text = explain_str(df, "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m, text[:2000]
    pf = m.group(1)
    assert "__partition" in pf and "__segment" in pf, pf
    # exactly one candidate partition for a single-value equality filter
    assert re.search(r"__partition.* IN \(\d+\)|__partition.* = \d+", pf), pf
    # the fixture's layout really is multi-dimensional on disk
    from incubator_horaedb_spark.querybank.partitioned import _partitioned_events

    tbl = _partitioned_events(spark, sf_dir)
    data = tbl.catalog.data_dir("ev_part")
    import os

    parts = [d for d in os.listdir(data) if d.startswith("__partition=")]
    assert len(parts) > 1, parts
    segs = [
        d
        for d in os.listdir(os.path.join(data, parts[0]))
        if d.startswith("__segment=")
    ]
    assert len(segs) > 1, segs
    # and the pruned (partition x segment) directory set is a strict
    # subset of the layout: one candidate partition (of >1) and the
    # 7 in-range segment days (of ~30) — inputFiles() can't show this
    # (it lists the relation pre-pruning), but PartitionFilters above is
    # Spark's listing-time prune contract over exactly these directories
    from incubator_horaedb_spark.partition import locate_partitions_for_read
    from incubator_horaedb_spark.querybank.partitioned import (
        _HI_MS,
        _LO_MS,
        _NPART,
        _SEG_MS,
    )

    cand = locate_partitions_for_read(spark, ["event_type"], _NPART, {"event_type": "click"})
    assert cand is not None and len(cand) == 1
    lo_seg, hi_seg = _LO_MS // _SEG_MS, (_HI_MS - 1) // _SEG_MS
    n_selected = 0
    for p in parts:
        pid = int(p.split("=")[1])
        p_segs = [
            int(d.split("=")[1])
            for d in os.listdir(os.path.join(data, p))
            if d.startswith("__segment=")
        ]
        n_selected += sum(
            1 for s in p_segs if pid in cand and lo_seg <= s <= hi_seg
        )
    n_total = sum(
        1
        for p in parts
        for d in os.listdir(os.path.join(data, p))
        if d.startswith("__segment=")
    )
    assert 0 < n_selected < n_total / 4, (n_selected, n_total)
