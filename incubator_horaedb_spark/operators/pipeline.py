"""Training-data pipeline compositions (beyond-reference, LLM-pipeline
grade): end-to-end near-dup removal, benchmark decontamination,
deterministic stratified sampling, and a corpus mix report.  Dual-dialect
templates (operators/dialect.py) — each Spark query and its DuckDB oracle
render from the same fragments.

These are the operators a 100 TB pretraining pipeline composes from the
primitives in operators/{dedup,text}.py:

- ``survivors``      — dedup APPLIED: which documents remain after near-dup
                       cluster collapse (keep exactly one representative per
                       cluster + all unclustered docs).  Pairs alone
                       over-remove; this is the actionable output.
- ``decontaminate``  — benchmark contamination: corpus documents whose
                       shingle sets overlap a held-out benchmark slice
                       above a threshold.  Candidate generation is a
                       bucketed equi-join on the shingle hash (never
                       all-pairs), the standard n-gram-overlap decontam
                       from public LLM-data literature.
- ``stratified sample`` — deterministic multiplicative-hash Bernoulli
                       sampling per stratum: reproducible across engines
                       and runs (no RNG), the data-mixing primitive.
- ``mix report``     — per-language corpus audit: doc counts, token totals,
                       mean quality — the composition of text ops that
                       drives mixture weights.
"""

from __future__ import annotations

from incubator_horaedb_spark.operators import dedup
from incubator_horaedb_spark.operators.dialect import Dialect

# ---------------------------------------------------- near-dup survivors --


def survivors_final_select(d: Dialect, table: str, labels_src: str) -> str:
    """Survivors = docs not in any cluster, plus each cluster's min-id
    representative (label == own id after convergence)."""
    return f"""SELECT d.doc_id
    FROM {table} d
    LEFT JOIN {labels_src} l ON l.doc_id = d.doc_id
    WHERE l.doc_id IS NULL OR l.lbl = d.doc_id"""


def dedup_survivors_sql(d: Dialect, table: str = "documents", threshold: float = 0.8) -> str:
    """One-shot rendering (oracle side): minhash-LSH pairs → exact CC
    labels → survivor selection."""
    ctes = (
        dedup._shingle_ctes(d, table)
        + [
            ("ex", d.unnest_select("doc_id", "shs", "h", "hs")),
            ("sig", f"SELECT doc_id,\n           {dedup._sig_cols()}\n      FROM ex GROUP BY doc_id"),
        ]
        + dedup._pairs_ctes(d, "hs", "sig")
        + [("edges", dedup.cc_edges_select(d, "verified", threshold))]
        + dedup.cc_label_ctes(d, "edges")
    )
    return d.cte_query(ctes, survivors_final_select(d, table, "labels"))


# ----------------------------------------------------- decontamination --

BENCH_MOD = 97  # doc_id % 97 == 0 → the held-out "benchmark" slice
# Flag docs sharing >= 5% of their shingles with the benchmark vocabulary —
# aggressive, as decontamination should be (false positives only cost a
# little data; false negatives leak eval answers into training).
DECONTAM_THRESHOLD = 0.05


def decontaminate_ctes(d: Dialect, hs_src: str) -> list[tuple[str, str]]:
    """Shared-shingle overlap between the corpus slice and the benchmark
    slice.  ``bench_h`` is the distinct benchmark shingle vocabulary; the
    equi-join on the hash makes the work Σ_h df_corpus(h)·df_bench(h) —
    bucketed, never |corpus|×|bench| pairs."""
    return [
        (
            "bench_h",
            f"""SELECT DISTINCT h FROM (
        {d.unnest_select("doc_id", "shs", "h", hs_src)}
      ) b WHERE doc_id % {BENCH_MOD} = 0""",
        ),
        (
            "corp_ex",
            f"""SELECT doc_id, h FROM (
        {d.unnest_select("doc_id", "shs", "h", hs_src)}
      ) c WHERE doc_id % {BENCH_MOD} <> 0""",
        ),
        (
            "hits",
            """SELECT c.doc_id, count(*) AS n_shared
      FROM corp_ex c JOIN bench_h b ON b.h = c.h
      GROUP BY c.doc_id""",
        ),
        (
            "sized",
            f"""SELECT t.doc_id, hits.n_shared,
             (CAST(floor((CAST(hits.n_shared AS DOUBLE) / {d.size('t.shs')}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS overlap
      FROM hits JOIN {hs_src} t ON t.doc_id = hits.doc_id""",
        ),
    ]


def decontaminate_sql(d: Dialect, table: str = "documents") -> str:
    """One-shot rendering (oracle side)."""
    ctes = dedup._shingle_ctes(d, table) + decontaminate_ctes(d, "hs")
    return d.cte_query(
        ctes,
        f"SELECT doc_id, n_shared, overlap FROM sized WHERE overlap >= {DECONTAM_THRESHOLD}",
    )


def decontaminate_from_hs_select(d: Dialect, hs_src: str) -> str:
    """From a materialized shingle view (staged Spark path)."""
    return d.cte_query(
        decontaminate_ctes(d, hs_src),
        f"SELECT doc_id, n_shared, overlap FROM sized WHERE overlap >= {DECONTAM_THRESHOLD}",
    )


# ----------------------------------------------- stratified sampling --

# Knuth multiplicative hash constants: deterministic, engine-portable
# BIGINT arithmetic (event_id·A fits int64 for any realistic id), no RNG.
_SAMPLE_A = 2654435761
_SAMPLE_P = 2147483647


def sample_hash_expr(id_expr: str) -> str:
    return f"(({id_expr}) * {_SAMPLE_A}) % {_SAMPLE_P}"


def stratified_sample_sql(
    d: Dialect, table: str = "events", pct: int = 10
) -> str:
    """Deterministic ~pct% Bernoulli sample per row, audited per stratum:
    (event_type, n_total, n_sampled, sum of sampled values).  The hash
    gate is a pure projection — at 100 TB the sample is taken at scan
    speed with no shuffle before the final small agg; reproducibility
    (same rows every run/engine) is what makes the sample auditable."""
    gate = f"{sample_hash_expr('event_id')} % 100 < {pct}"
    return f"""
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {gate} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           (CAST(floor((sum(CASE WHEN {gate} THEN CAST(floor((value * 1048576) + 0.5) AS DOUBLE) / 1048576 ELSE 0 END)) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))
             AS sampled_value_sum
    FROM {table}
    GROUP BY event_type
    """


def split_assign_sql(
    d: Dialect, table: str = "documents", train_pct: int = 90, val_pct: int = 5
) -> str:
    """Deterministic train/val/test split assignment + per-(source, split)
    audit report — the materialization step every pretraining run needs
    before sharding.  The split is a pure projection over a seeded LCG
    hash of doc_id (reproducible across runs AND engines: all-integer
    arithmetic), so at 100 TB assignment happens at scan speed with no
    shuffle before the small audit aggregation; the same predicate used
    as a filter materializes each split without a global sort or join.
    Train/val boundaries are percent thresholds on hash % 100 — a row's
    split never changes when the corpus grows (stable assignment, unlike
    row_number striping)."""
    bucket = f"({sample_hash_expr(f'doc_id % {_SAMPLE_P}')}) % 100"
    split = (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )
    return d.cte_query(
        [
            (
                "assigned",
                f"SELECT doc_id, source, n_chars, {split} AS split FROM {table}",
            )
        ],
        """SELECT source, split,
           CAST(count(*) AS BIGINT)    AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT)  AS min_doc_id
    FROM assigned
    GROUP BY source, split""",
    )


# ------------------------------------------------------- mix report --


def mix_report_sql(d: Dialect, table: str = "documents") -> str:
    """Per-predicted-language corpus audit: docs, BPE-token total, mean
    quality score.

    ONE scan, no joins: every input (language hits, quality ratios, token
    counts) is a per-row expression, so the whole report is a projection
    chain + one aggregation — at 100 TB that's scan speed, vs. the naive
    3-subquery self-join that reads the corpus three times and shuffles
    twice.  The formulas are exactly the standalone text-op definitions
    (operators/text.py), so the report agrees with the gated
    text_langid/text_quality/text_token_count queries."""
    from incubator_horaedb_spark.operators.text import _LANG_PRIORITY, _stop_hits

    toks_lower = d.tokens("lower(text)")
    hit_cols = ",\n             ".join(
        f"{_stop_hits(d, toks_lower, lang)} AS hits_{lang}" for lang in _LANG_PRIORITY
    )
    toks = d.tokens("text")
    n_tokens = d.size(toks)
    no_punct = d.regexp_replace_all("text", "[.!?,;:]", "")
    if d.engine == "spark":
        bpe = "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
    else:
        bpe = "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))"
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANG_PRIORITY) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in _LANG_PRIORITY:
        pred += f"WHEN hits_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return d.cte_query(
        [
            (
                "m",
                f"""SELECT doc_id,
             {hit_cols},
             length(text) AS n_chars,
             CAST({bpe} AS BIGINT) AS bpe_tokens,
             CAST(length(text) - length({no_punct}) AS DOUBLE) / length(text) AS punct_ratio,
             CAST({_stop_hits(d, toks_lower, 'en')} AS DOUBLE) / {n_tokens} AS stop_ratio
      FROM {table}
      WHERE length(text) > 0""",
            ),
            (
                "p",
                f"""SELECT doc_id, {pred} AS pred_lang, bpe_tokens,
             (CAST(floor((1.0 / (1.0 + exp(-(0.002 * n_chars + 2.0 * stop_ratio - 8.0 * punct_ratio)))) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))
               AS quality_score
      FROM m""",
            ),
        ],
        """SELECT pred_lang,
           count(*) AS n_docs,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           (CAST(floor((sum(CAST(floor((quality_score * 1048576) + 0.5) AS DOUBLE) / 1048576) / count(*)) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))
             AS mean_quality
    FROM p
    GROUP BY pred_lang""",
    )


def sessionize_sql(d: Dialect, table: str = "events", gap_ms: int = 1_800_000) -> str:
    """Gap-based sessionization over an event stream: a new session starts
    when a user's inter-event gap exceeds ``gap_ms`` (30 min default —
    the standard web-analytics cut).  Batch rendering of the streaming
    sessionizer (streaming/windows.py::sessionize): same session
    definition, expressible in pure SQL via LAG + running SUM.

    Scale shape: both window passes and the final agg are keyed by
    user_id, so Spark plans ONE shuffle and reuses the partitioning —
    per-user state never leaves its partition (the batch analogue of
    applyInPandasWithState's keyed state).  Tie-safety: equal-timestamp
    rows have gap 0, so session assignment is order-independent."""
    t = d.epoch_ms("ts")
    lag = "LAG(t) OVER (PARTITION BY user_id ORDER BY t)"
    running = (
        "SUM(brk) OVER (PARTITION BY user_id ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return d.cte_query(
        [
            ("e", f"SELECT user_id, {t} AS t FROM {table}"),
            (
                "g",
                f"SELECT user_id, t, CASE WHEN {lag} IS NULL "
                f"OR t - {lag} > {gap_ms} THEN 1 ELSE 0 END AS brk FROM e",
            ),
            ("s", f"SELECT user_id, t, {running} AS session_id FROM g"),
        ],
        """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(t) AS BIGINT) AS session_start,
           CAST(max(t) - min(t) AS BIGINT) AS duration_ms
    FROM s GROUP BY user_id, session_id""",
    )


def zorder_sql(d: Dialect, table: str = "part", bits: int = 16) -> str:
    """Z-order (Morton) interleave of two integer dimensions — the
    multi-dimensional generalization of the sampled 1-D sort key
    (table.py): writing files ordered by z-value gives row-group min/max
    selectivity on BOTH columns at once, the standard multi-dim clustering
    technique for large scan-pruned tables (public: Delta/Iceberg OPTIMIZE
    ZORDER).  Pure integer fold — identical arithmetic on both engines;
    2×``bits`` ≤ 42 keeps the z-value in int64."""
    x = f"(p_partkey % {1 << bits})"
    y = f"(p_size % {1 << bits})"
    bit = lambda v, j, off: d.shl(f"({d.shr(v, j)} & 1)", f"2 * ({j}) + {off}")  # noqa: E731
    body = f"acc + {bit(x, '(j - 1)', 0)} + {bit(y, '(j - 1)', 1)}"
    z = d.fold(d.range1(str(bits)), "j", "acc", body)
    return (
        f"SELECT p_partkey, p_size, CAST({z} AS BIGINT) AS zvalue "
        f"FROM {table} ORDER BY zvalue, p_partkey LIMIT 200"
    )


# ------------------------------------------- end-to-end corpus curation --


def curation_from(
    d: Dialect,
    table: str,
    t_src: str,
    hs_src: str,
    lead_ctes: list | None = None,
    train_pct: int = 90,
    val_pct: int = 5,
) -> str:
    """The full training-data curation DAG as ONE composed query — the
    pipeline a pretraining run actually executes, chaining the gated
    operators end to end:

      quality gate (language/length/repetition, text.QF_KEEP)
        → exact dedup (keep the min-doc_id per normalized text)
        → benchmark decontamination (drop >= 5%-shingle-overlap docs AND
          the held-out benchmark slice itself)
        → deterministic train/val/test split assignment
        → per-(source, split) audit: docs, token totals, id checksum.

    Every stage reuses the standalone operator's fragment (quality_flag_ctes,
    exact-dedup group, decontaminate_ctes, split_assign hash), so the
    composition provably agrees with the individually-gated queries.

    Scale shape: the quality flags and split assignment are map-side; the
    compose adds one groupBy for exact dedup (normalized-text hash), the
    bucketed decontam join, and doc_id-keyed joins between stages — every
    join key is the doc id or a content hash, so the whole DAG is a chain
    of co-partitionable shuffles with no cartesian anywhere.  At 100 TB
    each arrow materializes to a table; the SQL is the same."""
    from incubator_horaedb_spark.operators import text as _text

    norm = d.regexp_replace_all("lower(text)", " +", " ")
    bucket = f"({sample_hash_expr(f'f.doc_id % {_SAMPLE_P}')}) % 100"
    split = (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )
    keep = (
        "(f.stop_hits > 0 AND f.n_tokens >= 10 AND f.n_tokens <= 5000 "
        "AND NOT COALESCE(f.repetitive, FALSE))"
    )
    ctes = (
        list(lead_ctes or [])
        + _text.quality_flag_ctes(d, t_src)
        + [("ed", f"SELECT min(doc_id) AS keep_id FROM {table} GROUP BY {norm}")]
        + decontaminate_ctes(d, hs_src)
        + [
            (
                "contaminated",
                f"SELECT doc_id FROM sized WHERE overlap >= {DECONTAM_THRESHOLD}",
            ),
            (
                "surv",
                f"""SELECT f.doc_id, f.source, f.n_tokens, {split} AS split
      FROM flagged f
      JOIN ed ON ed.keep_id = f.doc_id
      LEFT JOIN contaminated c ON c.doc_id = f.doc_id
      WHERE {keep} AND c.doc_id IS NULL AND f.doc_id % {BENCH_MOD} <> 0""",
            ),
        ]
    )
    return d.cte_query(
        ctes,
        """SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM surv
    GROUP BY source, split""",
    )


def curation_e2e_sql(d: Dialect, table: str = "documents") -> str:
    """One-shot rendering (oracle side)."""
    from incubator_horaedb_spark.operators.text import qf_tokens_select

    lead = [("t", qf_tokens_select(d, table))] + dedup._shingle_ctes(d, table)
    return curation_from(d, table, "t", "hs", lead_ctes=lead)


# ------------------------------------------ Bloom-filter decontamination --
# Same contamination semantics as decontaminate_ctes, but the benchmark
# vocabulary is compacted into a Bloom bitset instead of joined as rows —
# the 100 TB shape: the filter is ~8 KB regardless of benchmark size, so
# the probe side needs NO shuffle at all (4 broadcast joins against a
# 1024-row word table), where the exact equi-join shuffles the corpus
# shingle stream.  False positives are deterministic (same hash family on
# both engines), so the result is still exactly oracle-checkable.
_BLOOM_WORDS = 1024  # bitset words
_BLOOM_WORD_BITS = 62  # bits used per word (stay clear of the sign bit)
_BLOOM_M = _BLOOM_WORDS * _BLOOM_WORD_BITS
# Independent affine permutations of the 31-bit shingle hash (public
# Knuth/xxhash multiplier constants); h*A + B < 2^63.
_BLOOM_A = (2654435761, 2246822519, 3266489917, 668265263)
_BLOOM_B = (11, 17, 23, 31)


def _bloom_pos(j: int, h: str = "h") -> str:
    return f"((({h}) * {_BLOOM_A[j]} + {_BLOOM_B[j]}) % {dedup.P} % {_BLOOM_M})"


def bloom_decontaminate_ctes(d: Dialect, hs_src: str) -> list[tuple[str, str]]:
    """CTE chain ending in ``sized`` (doc_id, n_maybe, overlap)."""
    k = len(_BLOOM_A)
    build_selects = "\n      UNION ALL\n      ".join(
        f"SELECT {_bloom_pos(j)} // {_BLOOM_WORD_BITS} AS word, "
        f"{d.shl('1', f'{_bloom_pos(j)} % {_BLOOM_WORD_BITS}')} AS m FROM bench_h"
        if d.engine == "duckdb"
        else f"SELECT CAST({_bloom_pos(j)} / {_BLOOM_WORD_BITS} AS BIGINT) AS word, "
        f"{d.shl('1', f'{_bloom_pos(j)} % {_BLOOM_WORD_BITS}')} AS m FROM bench_h"
        for j in range(k)
    )
    probe_cols = ",\n             ".join(
        (
            f"CAST({_bloom_pos(j)} / {_BLOOM_WORD_BITS} AS BIGINT) AS w{j}"
            if d.engine == "spark"
            else f"{_bloom_pos(j)} // {_BLOOM_WORD_BITS} AS w{j}"
        )
        + f",\n             {_bloom_pos(j)} % {_BLOOM_WORD_BITS} AS b{j}"
        for j in range(k)
    )
    bloom_joins = "\n      ".join(
        f"JOIN bloom bl{j} ON bl{j}.word = p.w{j} "
        f"AND (bl{j}.mask & {d.shl('1', f'p.b{j}')}) <> 0"
        for j in range(k)
    )
    return [
        (
            "bench_h",
            f"""SELECT DISTINCT h FROM (
        {d.unnest_select("doc_id", "shs", "h", hs_src)}
      ) b WHERE doc_id % {BENCH_MOD} = 0""",
        ),
        (
            "bloom",
            f"""SELECT word, bit_or(m) AS mask FROM (
      {build_selects}
      ) pos GROUP BY word""",
        ),
        (
            "probe",
            f"""SELECT doc_id, h,
             {probe_cols}
      FROM ({d.unnest_select("doc_id", "shs", "h", hs_src)}) c
      WHERE doc_id % {BENCH_MOD} <> 0""",
        ),
        (
            "hits",
            f"""SELECT p.doc_id, count(*) AS n_maybe
      FROM probe p
      {bloom_joins}
      GROUP BY p.doc_id""",
        ),
        (
            "sized",
            f"""SELECT t.doc_id, hits.n_maybe,
             (CAST(floor((CAST(hits.n_maybe AS DOUBLE) / {d.size('t.shs')}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS overlap
      FROM hits JOIN {hs_src} t ON t.doc_id = hits.doc_id""",
        ),
    ]


def bloom_decontaminate_sql(d: Dialect, table: str = "documents") -> str:
    """One-shot rendering (oracle side)."""
    ctes = dedup._shingle_ctes(d, table) + bloom_decontaminate_ctes(d, "hs")
    return d.cte_query(
        ctes,
        f"SELECT doc_id, n_maybe, overlap FROM sized WHERE overlap >= {DECONTAM_THRESHOLD}",
    )


def bloom_decontaminate_from_hs_select(d: Dialect, hs_src: str) -> str:
    """From a materialized shingle view (staged Spark path)."""
    return d.cte_query(
        bloom_decontaminate_ctes(d, hs_src),
        f"SELECT doc_id, n_maybe, overlap FROM sized WHERE overlap >= {DECONTAM_THRESHOLD}",
    )


def weighted_sample_sql(d: Dialect, table: str = "documents") -> str:
    """Per-source WEIGHTED sampling — the data-mixing primitive: each
    source keeps a different deterministic fraction of its documents
    (mixture weights, e.g. upsample curated sources / downsample crawl),
    driven by the same multiplicative hash as the Bernoulli sample so the
    kept set is reproducible across engines and runs.  Weight for source
    'srcN' = (N % 5 + 1) * 10 percent — a closed form the oracle
    restates.  One scan, map-side gate, small per-source audit agg."""
    src_num = f"CAST(substr(source, 4, 10) AS BIGINT)"
    weight_pct = f"(({src_num}) % 5 + 1) * 10"
    gate = f"{sample_hash_expr('doc_id')} % 100 < {weight_pct}"
    return f"""
    SELECT source,
           CAST({weight_pct} AS BIGINT) AS weight_pct,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {gate} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(min(CASE WHEN {gate} THEN doc_id END) AS BIGINT) AS first_kept
    FROM {table}
    GROUP BY source
    """


# ------------------------------------------- split leakage audit --
def split_leakage_sql(
    d: Dialect, table: str = "documents", train_pct: int = 90, val_pct: int = 5
) -> str:
    """Cross-split near-duplicate leakage audit — the eval-integrity check
    every pretraining run needs: a test document with a near-identical
    train twin silently inflates benchmark scores.  Composes the split
    assignment (split_assign_sql's seeded-hash buckets: pure projection,
    no shuffle) with the edit-distance near-dup detector
    (dedup.edit_distance_pairs_select: blocked equi-join candidates +
    exact levenshtein verify — never all-pairs).  Output is the
    per-(split, split) leaked-pair matrix; at 100 TB the only shuffles
    are the block-key join and a 9-row-max final agg."""
    bucket = f"({sample_hash_expr(f'doc_id % {_SAMPLE_P}')}) % 100"
    split = (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )
    ctes = dedup._prefix_block_ctes(d, table, extra_cols=f"{split} AS split") + [
        (
            "leaks",
            dedup.edit_distance_pairs_select(
                d, "admitted", extra=", a.split AS split_a, b.split AS split_b"
            ),
        ),
    ]
    return d.cte_query(
        ctes,
        """SELECT least(split_a, split_b)    AS split_lo,
           greatest(split_a, split_b) AS split_hi,
           CAST(count(*) AS BIGINT)   AS n_leaked_pairs,
           CAST(min(doc_a) AS BIGINT) AS first_doc_a,
           CAST(max(edit_dist) AS BIGINT) AS max_edit_dist
    FROM leaks
    GROUP BY least(split_a, split_b), greatest(split_a, split_b)""",
    )


# ------------------------------------------- sequence packing --
PACK_CAPACITY = 512  # token budget per packed training sequence


def pack_sequences_sql(
    d: Dialect, table: str = "documents", capacity: int = PACK_CAPACITY
) -> str:
    """Token-budget sequence packing (next-fit by running sum) — the step
    that turns a filtered corpus into fixed-budget training sequences
    without padding waste.  Each (source, shard) stream is packed
    independently: bin_id = (running token total before this doc) DIV
    capacity, so a document lands in the bin where its stream position
    starts (contiguous, deterministic, one window pass — the streaming
    next-fit every packing implementation uses).

    Scale shape: the window partitions on (source, doc_id % 8), not on
    source alone — packing needs *an* order, not a global one, and the
    shard key bounds any one window's rows at 1/8 of a source, keeping
    the sort-based window parallel even when one source dominates the
    corpus (raise the shard count with corpus size).  Output is the
    per-bin audit (n_docs, tokens, fill vs capacity); emitting the
    doc→bin map instead is the same query minus the final GROUP BY."""
    tok_n = d.size(d.tokens("text"))
    shard = "doc_id % 8"
    cum = (
        "sum(tok_n) OVER (PARTITION BY source, shard ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return d.cte_query(
        [
            (
                "toks",
                f"SELECT doc_id, source, {shard} AS shard, "
                f"CAST({tok_n} AS BIGINT) AS tok_n FROM {table}",
            ),
            (
                "packed",
                f"SELECT doc_id, source, shard, tok_n, "
                f"CAST({d.idiv(f'({cum} - tok_n)', str(capacity))} AS BIGINT)"
                f" AS bin_id FROM toks",
            ),
        ],
        f"""SELECT source, shard, bin_id,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(tok_n) AS BIGINT) AS bin_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id
    FROM packed
    GROUP BY source, shard, bin_id""",
    )


# ------------------------------------------- budget-constrained selection --
SELECT_BUDGET_TOKENS = 20_000  # per-source token budget


def budget_select_sql(
    d: Dialect, table: str = "documents", budget: int = SELECT_BUDGET_TOKENS
) -> str:
    """Token-budget data selection: per source, take documents in
    priority order until the token budget is exhausted — the selection
    step of budget-constrained training-set construction (take the
    best-scored docs that fit).  Priority here is (n_chars DESC, doc_id)
    as the pluggable score placeholder; swapping in the quality
    classifier score changes one ORDER BY.

    A doc is kept iff the running token total BEFORE it is under budget
    (the same streaming cumsum-window shape as pack_sequences — one
    window per source, no iteration, deterministic under the total
    order).  Output is the per-source selection audit."""
    tok_n = d.size(d.tokens("text"))
    cum_before = (
        "sum(tok_n) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_n"
    )
    return d.cte_query(
        [
            (
                "toks",
                f"SELECT doc_id, source, n_chars, CAST({tok_n} AS BIGINT) AS tok_n "
                f"FROM {table}",
            ),
            (
                "sel",
                f"SELECT doc_id, source, tok_n, "
                f"CASE WHEN {cum_before} < {budget} THEN 1 ELSE 0 END AS kept FROM toks",
            ),
        ],
        f"""SELECT source,
           CAST(count(*) AS BIGINT)                           AS n_docs,
           CAST(sum(kept) AS BIGINT)                          AS n_kept,
           CAST(sum(CASE WHEN kept = 1 THEN tok_n ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(min(CASE WHEN kept = 1 THEN doc_id END) AS BIGINT) AS first_kept
    FROM sel
    GROUP BY source""",
    )


# ------------------------------------------- exact-dup inflation report --
def dup_inflation_sql(d: Dialect, table: str = "documents") -> str:
    """Per-source exact-duplicate inflation: raw doc count vs distinct
    texts and the inflation ratio — the first corpus-health number a
    data curator looks at (a source with inflation >> 1 is a crawler
    trap or a mirror, and gets exact-dedup'd before any fuzzy pass
    spends compute on it).  count(DISTINCT text) is one hash agg keyed
    by (source, text) then by source — at 100 TB Spark plans this as
    partial aggregation on the full string; swap `text` for a content
    hash column to cut shuffle width when texts are large (the exact
    dedup pipeline materializes that hash anyway)."""
    r4 = (
        lambda e: f"(CAST(floor(({e}) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" AS DOUBLE) / CAST(10000 AS DOUBLE))"
    )
    return f"""SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs,
           {r4('CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT text) AS DOUBLE)')}
               AS inflation
    FROM {table} GROUP BY source"""


# ------------------------------------------- hybrid RRF retrieval fusion --
def rrf_fusion_sql(
    d, table: str = "documents", k_each: int = 20, k_out: int = 10, c: int = 60
) -> str:
    """Reciprocal Rank Fusion of a sparse (BM25) and a dense (embedding
    cosine) retriever — the standard hybrid-search combiner (Cormack,
    Clarke & Buettcher, SIGIR 2009, public; the formula Elasticsearch/
    Vespa/OpenSearch ship): score(d) = Σ_r 1/(c + rank_r(d)) over the
    retrievers that returned d in their top-``k_each``.  Rank fusion
    needs no score calibration between retrievers — exactly why it wins
    for corpus slicing where BM25 and cosine scores live on different
    scales.  The dense query is the corpus vector keyed 0 (embeddings
    and documents share the id space in this corpus); the sparse query
    is bm25_sql's fixed term set.

    Determinism: both ranks are integers from total-ordered row_numbers;
    1/(c + rank) is one IEEE division, the two-term sum is a fixed
    expression (not an aggregate), and the fused ordering re-ranks on
    the rounded score with a doc_id tie-break.

    Scale shape: each retriever's chain is its own proven shape (BM25:
    one scan + tiny stats broadcast; dense: 1×N scored join); fusion is
    a FULL OUTER JOIN of two k_each-row lists — driver-trivial at any
    corpus size."""
    from incubator_horaedb_spark.operators.similarity import (
        km_quant_select,
        km_qv_select,
        _dot,
        _r6,
    )
    from incubator_horaedb_spark.operators.text import bm25_ranked_ctes

    cos = f"({_dot(d, 'dq.qe', 'e.q')}) / (dq.qnrm * e.nrm)"
    rrf = (
        f"(coalesce(1.0 / ({c}.0 + CAST(b.rn AS DOUBLE)), 0.0)"
        f" + coalesce(1.0 / ({c}.0 + CAST(dn.rn AS DOUBLE)), 0.0))"
    )
    ctes = bm25_ranked_ctes(d, table, k_cap=k_each) + [
        ("qraw", km_quant_select(d, "embeddings")),
        ("qv", km_qv_select(d, "qraw")),
        ("dq", "SELECT q AS qe, nrm AS qnrm FROM qv WHERE vec_id = 0"),
        (
            "dscored",
            f"SELECT e.vec_id AS doc_id, {_r6(cos)} AS cosine "
            f"FROM dq CROSS JOIN qv e WHERE e.vec_id <> 0",
        ),
        (
            "dranked",
            f"""SELECT doc_id, cosine,
             row_number() OVER (ORDER BY cosine DESC, doc_id) AS rn
      FROM (SELECT doc_id, cosine FROM dscored
            ORDER BY cosine DESC, doc_id LIMIT {k_each}) dtopk_""",
        ),
        (
            "fused",
            f"""SELECT coalesce(b.doc_id, dn.doc_id) AS doc_id,
             b.rn AS bm25_rank, dn.rn AS emb_rank,
             {_r6(rrf)} AS rrf_score
      FROM (SELECT doc_id, rn FROM ranked WHERE rn <= {k_each}) b
      FULL OUTER JOIN (SELECT doc_id, rn FROM dranked WHERE rn <= {k_each}) dn
        ON dn.doc_id = b.doc_id""",
        ),
    ]
    return d.cte_query(
        ctes,
        f"""SELECT doc_id, bm25_rank, emb_rank, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rnk
    FROM fused
    ORDER BY rnk
    LIMIT {k_out}""",
    )


# ------------------------------------------- exact-k per-stratum sample --
def sample_topk_per_group_sql(
    d: Dialect, table: str = "documents", k: int = 5
) -> str:
    """Deterministic EXACT-k sample per stratum — the distributed
    reservoir: rank documents within each source by their multiplicative
    hash (a fixed pseudo-random total order, no RNG) and keep the k
    smallest.  Bernoulli sampling (sample_stratified) gives ~pct% with
    binomial variance; pipelines that need exactly-k-per-bucket
    (few-shot exemplars, per-source eval panels, stratified golden sets)
    use this.  Reproducible across engines/runs by construction.

    Scale shape: ONE window shuffle keyed by the stratum; rank ties are
    impossible for distinct ids below the modulus, but doc_id breaks
    them anyway (total order).  Equivalent to a per-key TakeOrdered at
    scale — the window never materializes more than its partition."""
    h = sample_hash_expr("doc_id")
    return f"""
    SELECT source, doc_id, hrank
    FROM (
      SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id)
                  AS BIGINT) AS hrank
      FROM {table}
    ) r
    WHERE hrank <= {k}
    ORDER BY source, hrank
    """
