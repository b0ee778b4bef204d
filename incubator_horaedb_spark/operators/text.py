"""Text analysis operators (beyond-reference, LLM-pipeline grade):
language-ID heuristic, quality scoring, token counting, document
fingerprinting.  Dual-dialect templates — see operators/dialect.py.

All are embarrassingly parallel map-side expressions (no shuffle except
the final exact-dup groupBy in fingerprinting) — at 100 TB they run at
scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from incubator_horaedb_spark.functions.detfloat import dyadic_sql, r_out_sql

from incubator_horaedb_spark.operators.dialect import Dialect

STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "es": ["el", "la", "de", "los", "y", "un"],
    "fr": ["le", "les", "et", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ein", "ist"],
}
_LANG_PRIORITY = ["en", "es", "fr", "de"]


def _stop_hits(d: Dialect, tokens: str, lang: str) -> str:
    """Number of tokens (with multiplicity) that are stopwords of ``lang``."""
    arr = d.str_array(STOPWORDS[lang])
    return d.size(d.filter(tokens, "t", d.contains(arr, "t")))


def langid_sql(d: Dialect, table: str = "documents") -> str:
    """N-gram/stopword language-ID heuristic: argmax of per-language
    stopword hits with a fixed priority order; 'und' when no hits."""
    toks = d.tokens("lower(text)")
    hit_cols = ",\n             ".join(
        f"{_stop_hits(d, toks, lang)} AS hits_{lang}" for lang in _LANG_PRIORITY
    )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANG_PRIORITY) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in _LANG_PRIORITY:
        pred += f"WHEN hits_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return d.cte_query(
        [("scored", f"SELECT doc_id, lang,\n             {hit_cols}\n      FROM {table}")],
        f"""SELECT doc_id, lang AS actual_lang, {pred} AS pred_lang,
           CAST({best} AS BIGINT) AS score
    FROM scored""",
    )


def quality_sql(d: Dialect, table: str = "documents") -> str:
    """Quality scoring: length, punctuation ratio, stopword ratio, and a
    logistic composite score."""
    toks = d.tokens("text")
    n_tokens = d.size(toks)
    no_punct = d.regexp_replace_all("text", "[.!?,;:]", "")
    stop_hits = _stop_hits(d, d.tokens("lower(text)"), "en")
    return d.cte_query(
        [
            (
                "m",
                f"""SELECT doc_id,
             length(text) AS n_chars,
             CAST({n_tokens} AS BIGINT) AS n_tokens,
             CAST(length(text) - length({no_punct}) AS DOUBLE) / length(text) AS punct_ratio,
             CAST({stop_hits} AS DOUBLE) / {n_tokens} AS stop_ratio
      FROM {table}
      WHERE length(text) > 0""",
            )
        ],
        """SELECT doc_id, n_chars, n_tokens,
           (CAST(floor((punct_ratio) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS punct_ratio,
           (CAST(floor((stop_ratio) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS stop_ratio,
           (CAST(floor((1.0 / (1.0 + exp(-(0.002 * n_chars + 2.0 * stop_ratio - 8.0 * punct_ratio)))) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))
             AS quality_score
    FROM m""",
    )


def token_count_sql(d: Dialect, table: str = "documents") -> str:
    """Token counting: whitespace tokens and a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation)."""
    toks = d.tokens("text")
    if d.engine == "spark":
        bpe = "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
    else:
        bpe = "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))"
    return f"""
    SELECT doc_id,
           CAST({d.size(toks)} AS BIGINT) AS ws_tokens,
           CAST({bpe} AS BIGINT) AS bpe_tokens,
           (CAST(floor((CAST(length(text) AS DOUBLE) / {d.size(toks)}) * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(10000 AS DOUBLE)) AS chars_per_token
    FROM {table}
    """


def bm25_ranked_ctes(
    d: Dialect,
    table: str = "documents",
    terms: tuple[str, ...] = ("window", "merge", "stream"),
    k1: float = 1.2,
    b: float = 0.75,
    k_cap: int = 20,
) -> list[tuple[str, str]]:
    """The BM25 scoring chain up to the ranked list (tf → stats → scored →
    ranked) — shared by bm25_sql's top-k and the RRF fusion composition.
    ``ranked`` takes the top-``k_cap`` DISTRIBUTED (ORDER/LIMIT →
    TakeOrdered) before the row_number — a bare global window would
    single-partition every scored document at corpus scale."""
    toks = d.tokens("lower(text)")
    tf_parts = []
    for i, term in enumerate(terms):
        cond = f"t = '{term}'"
        tf_parts.append(f"{d.size(d.filter(toks, 't', cond))} AS tf_{i}")
    tf_cols = ",\n             ".join(tf_parts)
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * {k1 + 1.0})"
        f" / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / s.avgdl))"
        for i in range(len(terms))
    )
    return [
        (
            "tf",
            f"""SELECT doc_id,
             CAST({d.size(toks)} AS DOUBLE) AS dl,
             {tf_cols}
      FROM {table}""",
        ),
        (
            "stats",
            f"SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM tf",
        ),
        (
            "scored",
            f"SELECT doc_id, (CAST(floor(({score}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS bm25 FROM tf CROSS JOIN stats s",
        ),
        (
            "ranked",
            f"""SELECT doc_id, bm25,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
      FROM (SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC, doc_id LIMIT {k_cap}) topk_""",
        ),
    ]


def bm25_sql(
    d: Dialect,
    table: str = "documents",
    terms: tuple[str, ...] = ("window", "merge", "stream"),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 retrieval scoring — the classic quality-weighted term search a
    training-data pipeline uses for targeted corpus slicing (and the
    baseline every retrieval system is judged against).

    ONE corpus scan computes per-doc term frequencies; corpus statistics
    (N, avgdl, per-term df) are a single tiny aggregate broadcast back via
    CROSS JOIN; the score is fixed-arity per-row arithmetic — no shuffle
    besides the final top-k.  Scores are rounded to 6 digits (the same
    cross-engine transcendental tolerance as quality_sql's logistic)."""
    return d.cte_query(
        bm25_ranked_ctes(d, table, terms, k1, b, k_cap=k),
        f"SELECT doc_id, bm25 FROM ranked WHERE rn <= {k}",
    )


def fingerprint_sql(d: Dialect, table: str = "documents") -> str:
    """Rolling-hash document fingerprint over normalized text, plus the
    exact-dup group size per fingerprint (hash-groupBy dedup at scale).

    Uses the 4-chars-per-step chunked polynomial hash and a window count
    (hash evaluated once per doc, single shuffle on the fingerprint)."""
    norm = d.regexp_replace_all("lower(text)", " +", " ")
    return d.cte_query(
        [
            ("norm", f"SELECT doc_id, {d.pad_chunk(norm)} AS p FROM {table}"),
            ("fps", f"SELECT doc_id, {d.chunked_hash('p')} AS fingerprint FROM norm"),
        ],
        """SELECT doc_id, fingerprint,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size
    FROM fps""",
    )


def repetition_tokens_select(d: Dialect, table: str = "documents") -> str:
    """Stage 1 of the repetition filter: the token-array projection.  On
    Spark this MUST be materialized as a cached view by the caller —
    projection collapse otherwise re-expands the split() into every
    downstream reference (the CTE-inlining cliff, dialect.cte_query)."""
    return f"SELECT doc_id, {d.tokens('text')} AS toks FROM {table}"


def repetition_from(d: Dialect, src: str, lead_ctes: list | None = None) -> str:
    """Repetition metrics from a token view ``src`` (doc_id, toks).
    ``lead_ctes`` prepends stages (the one-shot oracle rendering passes the
    token projection; the Spark caller stages it as a cached view instead).
    """
    bigram = f"{d.at('toks', 'i')} || '_' || {d.at('toks', 'i + 1')}"
    bigrams = d.transform(d.range1(f"{d.size('toks')} - 1"), "i", bigram)
    return d.cte_query(
        list(lead_ctes or [])
        + [
            ("b", d.unnest_select("doc_id", bigrams, "bg", src)),
            ("c", "SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg"),
        ],
        """SELECT doc_id,
           CAST(max(n) AS BIGINT) AS top_bigram_n,
           CAST(sum(n) AS BIGINT) AS total_bigrams,
           CAST(count(*) AS BIGINT) AS distinct_bigrams,
           (max(n) * 5 >= sum(n)) AS flag_repetitive
    FROM c GROUP BY doc_id""",
    )


def repetition_sql(d: Dialect, table: str = "documents") -> str:
    """Repetition-based quality filter (the Gopher/MassiveText repetition
    rules, public: Rae et al. 2021 §A1.1): per-document fraction of
    duplicated token bigrams and the share of the single most frequent
    bigram; documents where the top bigram covers ≥20% of all bigrams are
    flagged.  All-integer outputs so the oracle hash is drift-free.

    Scale shape: explode to (doc, bigram) → partial/final hash agg keyed
    (doc_id, bg), then one agg per doc — two map-side-combinable shuffles,
    both keyed by doc so skew is bounded by document length.  One-shot
    rendering (this function) is the DuckDB oracle; the Spark side stages
    the token projection as a cached view first (querybank/llm_ops.py)."""
    return repetition_from(d, "t", lead_ctes=[("t", repetition_tokens_select(d, table))])


def ttr_sql(d: Dialect, table: str = "documents") -> str:
    """Type-token ratio per document (lexical diversity — a standard
    quality signal alongside the Gopher repetition rules): distinct
    lowercase tokens vs total tokens, flagging docs where fewer than 20%
    of tokens are distinct.  All-integer outputs (counts + flag) so the
    cross-engine hash cannot drift.  Single scan, pure projection — no
    shuffle at any scale."""
    toks = d.tokens("lower(text)")
    return d.cte_query(
        [("t", f"SELECT doc_id, {toks} AS toks FROM {table}")],
        f"""SELECT doc_id,
           CAST({d.size('toks')} AS BIGINT) AS n_tokens,
           CAST({d.size(d.distinct('toks'))} AS BIGINT) AS n_types,
           ({d.size(d.distinct('toks'))} * 5 < {d.size('toks')}) AS low_diversity
    FROM t""",
    )


def ngram_topk_from(d: Dialect, src: str, k: int = 20, lead_ctes: list | None = None) -> str:
    """Corpus-wide top-k token bigrams from a token view ``src`` (doc_id,
    toks) — the n-gram frequency table a tokenizer/contamination audit
    starts from.  Scale shape: explode to (bigram) → one map-side-
    combinable count shuffle keyed by bigram → TakeOrdered(k); ties break
    lexicographically so the result is total-ordered and engine-stable."""
    bigram = f"{d.at('toks', 'i')} || '_' || {d.at('toks', 'i + 1')}"
    bigrams = d.transform(d.range1(f"{d.size('toks')} - 1"), "i", bigram)
    return d.cte_query(
        list(lead_ctes or [])
        + [
            ("b", d.unnest_select("doc_id", bigrams, "bg", src)),
            ("c", "SELECT bg, count(*) AS n FROM b GROUP BY bg"),
        ],
        f"SELECT bg, CAST(n AS BIGINT) AS n FROM c ORDER BY n DESC, bg LIMIT {k}",
    )


def ngram_topk_sql(d: Dialect, table: str = "documents", k: int = 20) -> str:
    """One-shot rendering (oracle side) of :func:`ngram_topk_from`."""
    return ngram_topk_from(
        d, "t", k, lead_ctes=[("t", repetition_tokens_select(d, table))]
    )


# Java-regex ∩ RE2 common-subset patterns (no \b, no lookarounds)
_EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IPV4_RX = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
_PHONE_RX = "\\+[0-9]{7,15}"


def pii_scrub_sql(d: Dialect, table: str = "documents") -> str:
    """PII detection + redaction (emails, IPv4, E.164-ish phones) as pure
    regex expressions — map-side, codegen'd, no shuffle.

    The synthetic corpus contains no organic PII, so the query first
    injects deterministic PII derived from doc_id (identical expression in
    both dialects); the scrub then demonstrably finds and redacts it.
    Redaction order matters only across overlapping classes — none here."""
    inj = (
        "substr(text, 1, 80) || CASE"
        " WHEN doc_id % 3 = 0 THEN ' reach me at user"
        f"' || {d.cast_str('doc_id')} || '@mail.example.com'"
        f" WHEN doc_id % 3 = 1 THEN ' server 10.' || {d.cast_str('doc_id % 256')}"
        " || '.0.1 or call +14155552671'"
        " ELSE '' END"
    )
    red = d.regexp_scrub(
        d.regexp_scrub(d.regexp_scrub("body", _EMAIL_RX, "<EMAIL>"), _IPV4_RX, "<IP>"),
        _PHONE_RX,
        "<PHONE>",
    )
    return d.cte_query(
        [("p", f"SELECT doc_id, {inj} AS body FROM {table}")],
        f"""SELECT doc_id,
           CAST({d.size(d.regexp_extract_all('body', _EMAIL_RX))} AS BIGINT) AS n_emails,
           CAST({d.size(d.regexp_extract_all('body', _IPV4_RX))} AS BIGINT) AS n_ips,
           CAST({d.size(d.regexp_extract_all('body', _PHONE_RX))} AS BIGINT) AS n_phones,
           {red} AS redacted
    FROM p""",
    )


def chunk_sql(d: Dialect, table: str = "documents", chunk: int = 32, stride: int = 24) -> str:
    """Overlapping token-window chunking for training-data prep: each doc
    becomes ceil-strided windows of ``chunk`` tokens every ``stride``
    (chunk−stride tokens of overlap).  Explode-per-chunk keeps the op
    fully distributed — no per-doc collect, output rows ≈ n_tokens/stride.
    """
    n = d.size("toks")
    n_chunks = f"1 + {d.idiv(f'greatest({n} - {chunk}, 0) + {stride} - 1', str(stride))}"
    window = d.slice("toks", f"(i - 1) * {stride} + 1", str(chunk))
    return d.cte_query(
        [
            ("t", f"SELECT doc_id, {d.tokens('text')} AS toks FROM {table}"),
            ("x", d.unnest_select("doc_id, toks", d.range1(n_chunks), "i", "t")),
        ],
        f"""SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           {d.join_arr(window, ' ')} AS chunk_text,
           CAST({d.size(window)} AS BIGINT) AS n_tokens
    FROM x""",
    )


def shuffle_sql(d: Dialect, table: str = "documents", limit: int = 200) -> str:
    """Deterministic global shuffle (training-order randomization): rank by
    a seeded LCG permutation of doc_id.  At scale Spark executes the ORDER
    BY as a range-partitioned sort (sampled boundaries), or TakeOrdered
    when a LIMIT bounds it — either way no driver materialization."""
    from incubator_horaedb_spark.operators.dialect import P

    key = f"((doc_id % {P}) * 1103515245 + 12345) % {P}"
    return (
        f"SELECT doc_id, CAST({key} AS BIGINT) AS shuffle_key FROM {table} "
        f"ORDER BY shuffle_key, doc_id LIMIT {limit}"
    )


def qf_tokens_select(d: Dialect, table: str = "documents") -> str:
    """Stage 1 of the corpus quality filter: lowercased token arrays.
    Spark callers must materialize this as a cached view (CTE-inlining
    cliff — see dialect.cte_query)."""
    return f"SELECT doc_id, source, {d.tokens('lower(text)')} AS toks FROM {table}"


# The keep rule shared by the survivorship report and the end-to-end
# curation pipeline (columns of the ``flagged`` CTE).
QF_KEEP = (
    "(stop_hits > 0 AND n_tokens >= 10 AND n_tokens <= 5000 "
    "AND NOT COALESCE(repetitive, FALSE))"
)


def quality_flag_ctes(d: Dialect, src: str) -> list[tuple[str, str]]:
    """CTE chain ending in ``flagged`` (doc_id, source, n_tokens,
    stop_hits, repetitive) from a token view ``src`` — the per-doc inputs
    of the QF_KEEP rule."""
    hits = "greatest(" + ", ".join(
        _stop_hits(d, "toks", lang) for lang in _LANG_PRIORITY
    ) + ")"
    bigram = f"{d.at('toks', 'i')} || '_' || {d.at('toks', 'i + 1')}"
    bigrams = d.transform(d.range1(f"{d.size('toks')} - 1"), "i", bigram)
    return [
        (
            "m",
            f"SELECT doc_id, source, {d.size('toks')} AS n_tokens, "
            f"{hits} AS stop_hits FROM {src}",
        ),
        ("b", d.unnest_select("doc_id", bigrams, "bg", src)),
        ("cb", "SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg"),
        (
            "rep",
            "SELECT doc_id, (max(n) * 5 >= sum(n)) AS repetitive "
            "FROM cb GROUP BY doc_id",
        ),
        (
            "flagged",
            "SELECT m.doc_id, m.source, m.n_tokens, m.stop_hits, rep.repetitive "
            "FROM m LEFT JOIN rep ON m.doc_id = rep.doc_id",
        ),
    ]


def quality_filter_from(d: Dialect, src: str, lead_ctes: list | None = None) -> str:
    """Survivorship report from a staged token view ``src``."""
    keep = QF_KEEP
    return d.cte_query(
        list(lead_ctes or []) + quality_flag_ctes(d, src),
        f"""SELECT source,
           CAST(count(*) AS BIGINT) AS total_docs,
           CAST(sum(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(sum(CASE WHEN stop_hits = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_langid,
           CAST(sum(CASE WHEN n_tokens < 10 OR n_tokens > 5000 THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_length,
           CAST(sum(CASE WHEN COALESCE(repetitive, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
               AS flagged_repetitive
    FROM flagged GROUP BY source""",
    )


def quality_filter_sql(d: Dialect, table: str = "documents") -> str:
    """End-to-end corpus quality survivorship: combines the language-ID
    gate (any stopword hit), token-count bounds, and the repetition flag
    into per-source keep/drop counts — the report a training-data curation
    run emits before materializing the filtered corpus.

    Scale shape: one scan feeds both the per-doc metrics and the bigram
    explode; the join back is doc_id-keyed (no broadcast needed — both
    sides are doc-partitioned); the final agg is a few rows per source.
    All-integer outputs.  One-shot rendering = the DuckDB oracle; Spark
    stages the token view (querybank/llm_ops.py)."""
    return quality_filter_from(d, "t", lead_ctes=[("t", qf_tokens_select(d, table))])


def winnow_sql(d: Dialect, table: str = "documents", k: int = 3, w: int = 4) -> str:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    the MOSS local-fingerprinting algorithm, public): per document, hash
    every k-token shingle IN ORDER, slide a window of w consecutive shingle
    hashes, and select the minimum hash of each window; the distinct
    selected hashes are the document's fingerprints.  Guarantees every
    shared substring of >= w+k-1 tokens contributes a shared fingerprint,
    while storing only ~2/(w+1) of all shingle hashes — the storage-bounded
    alternative to full shingle sets for copy detection.

    Output: per-doc fingerprint count, an order-independent modular
    checksum of the fingerprint set, the minimum fingerprint, and the
    exact-duplicate group size over (checksum, n_fp) — documents whose
    entire winnow set matches (the scaled dedup grouping, mirroring
    fingerprint_sql's group_size).

    Scale shape: one scan, all per-doc array work map-side inside codegen
    (ordered k-gram combo reuses the hs_from_tokh polynomial), one window
    shuffle on the checksum.  All-integer outputs."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    return winnow_from(d, "tokh", k, w, lead_ctes=[("tokh", tokh_select(d, table))])


def winnow_from(
    d: Dialect, tokh_src: str, k: int = 3, w: int = 4, lead_ctes: list | None = None
) -> str:
    """Winnowing body from a materialized (doc_id, th) token-hash source —
    staged on the Spark side because CTE inlining would re-evaluate the
    O(chars) token-hash expression at each of kg's references."""
    from incubator_horaedb_spark.operators.dialect import BASE, P

    combo = "CAST(0 AS BIGINT)"
    for i in range(k):
        combo = f"(({combo}) * {BASE} + {d.at('th', f'i + {i}')}) % {P}"
    kgrams = d.transform(d.range1(f"{d.size('th')} - {k - 1}"), "i", combo)
    mins = d.transform(
        d.range1(f"{d.size('kg')} - {w - 1}"), "i", d.arr_min(d.slice_("kg", "i", str(w)))
    )
    checksum = d.fold("wf", "x", "acc", f"(acc + x) % {P}")
    return d.cte_query(
        (lead_ctes or [])
        + [
            (
                "kg",
                f"SELECT doc_id, {kgrams} AS kg FROM {tokh_src} WHERE {d.size('th')} >= {k}",
            ),
            (
                "wf",
                f"SELECT doc_id, {d.distinct(mins)} AS wf FROM kg "
                f"WHERE {d.size('kg')} >= {w}",
            ),
            (
                "s",
                f"""SELECT doc_id,
             CAST({d.size('wf')} AS BIGINT) AS n_fp,
             CAST({checksum} AS BIGINT) AS fp_checksum,
             CAST({d.arr_min('wf')} AS BIGINT) AS min_fp
      FROM wf""",
            ),
        ],
        """SELECT doc_id, n_fp, fp_checksum, min_fp,
           CAST(count(*) OVER (PARTITION BY fp_checksum, n_fp) AS BIGINT) AS group_size
    FROM s""",
    )


def rare_token_ratio_sql(d: Dialect, table: str = "documents", max_freq: int = 2) -> str:
    """Rare-token quality signal: the fraction of a document's tokens whose
    CORPUS-WIDE frequency is <= max_freq (hapax/dis legomena share) — a
    cheap proxy for noisy/OCR-damaged text (high ratio) vs boilerplate
    (near-zero), used as a Gopher-style curation rule on corpus statistics
    rather than per-doc features.

    Scale shape: the two-pass corpus-statistic pattern — one explode +
    hash-agg builds the token-frequency table (shuffle keyed on the token
    hash, partial->final so the map side combines), then the per-doc pass
    re-joins on the same key (co-partitioned by the same shuffle key, no
    broadcast needed at any vocabulary size) and reduces per doc_id.
    Exact integer counts; the ratio is one rational division."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    return rare_from_tokh(
        d, "tokh", max_freq, lead_ctes=[("tokh", tokh_select(d, table))]
    )


def rare_from_tokh(
    d: Dialect, tokh_src: str, max_freq: int = 2, lead_ctes: list | None = None
) -> str:
    """rare_token_ratio body from a materialized (doc_id, th) source."""
    r6 = (
        "(CAST(floor((CAST(n_rare AS DOUBLE) / n_tokens) * CAST(1000000 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))"
    )
    return d.cte_query(
        (lead_ctes or [])
        + [
            ("tok", d.unnest_select("doc_id", "th", "t", tokh_src)),
            ("freq", "SELECT t, count(*) AS cnt FROM tok GROUP BY t"),
            (
                "perdoc",
                f"""SELECT tok.doc_id,
             count(*) AS n_tok,
             sum(CASE WHEN freq.cnt <= {max_freq} THEN 1 ELSE 0 END) AS n_r
      FROM tok JOIN freq ON tok.t = freq.t
      GROUP BY tok.doc_id""",
            ),
            (
                "typed",
                "SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, "
                "CAST(n_r AS BIGINT) AS n_rare FROM perdoc",
            ),
        ],
        f"SELECT doc_id, n_tokens, n_rare, {r6} AS rare_ratio FROM typed",
    )


# ------------------------------------------ hashing-trick featurization --

FEATURE_DIM = 8
# Deterministic classifier weights/bias (stand-ins for a trained model's
# parameters — the PIPELINE is the deliverable: at deployment the literals
# are the trained coefficients, the plan is unchanged).
CLS_W = [0.12, -0.07, 0.31, -0.22, 0.05, 0.17, -0.14, 0.09]
CLS_B = -0.05


def hash_features_sql(d: Dialect, table: str = "documents", lead_ctes: list | None = None, tokh_src: str | None = None) -> str:
    """Feature hashing (the 'hashing trick', Weinberger et al. ICML 2009,
    public): bucket every token's hash into FEATURE_DIM counts — the
    fixed-width featurizer behind fastText-style corpus quality
    classifiers (CCNet/LLaMA-style data filtering).  Pure map-side
    projection over the token-hash array: zero shuffles, scan-speed
    featurization at any corpus size."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    if tokh_src is None:
        lead_ctes = [("tokh", tokh_select(d, table))]
        tokh_src = "tokh"
    cols = ",\n           ".join(
        f"CAST({d.size(d.filter('th', 't', f't % {FEATURE_DIM} = {j}'))} AS BIGINT) AS f{j}"
        for j in range(FEATURE_DIM)
    )
    return d.cte_query(
        list(lead_ctes or []),
        f"""SELECT doc_id,
           CAST({d.size('th')} AS BIGINT) AS n_tokens,
           {cols}
    FROM {tokh_src}
    WHERE {d.size('th')} > 0""",
    )


def classifier_score_sql(d: Dialect, table: str = "documents", lead_ctes: list | None = None, tokh_src: str | None = None) -> str:
    """Distributed classifier inference over hashed features: a linear
    model on length-normalized bucket frequencies, squashed by the
    RATIONAL sigmoid x/(1+|x|) (algebraic — bit-deterministic across
    engines, unlike exp()).  Per-source keep/drop audit.  The whole
    score is a per-row expression: classifier inference at scan speed,
    the shape of every learned quality filter in an LLM data pipeline."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    if tokh_src is None:
        lead_ctes = [("tokh", f"SELECT doc_id, source, {d.hash_list(d.tokens('text'))} AS th FROM {table}")]
        tokh_src = "tokh"
    z_terms = " + ".join(
        f"({w} * (CAST({d.size(d.filter('th', 't', f't % {FEATURE_DIM} = {j}'))} AS DOUBLE)"
        f" / {d.size('th')}))"
        for j, w in enumerate(CLS_W)
    )
    z = f"({z_terms} + {CLS_B})"
    score = f"({z} / (1.0 + abs({z})))"
    q20 = 1 << 20
    score_q = f"(CAST(floor(({score}) * {q20} + 0.5) AS DOUBLE) / {q20})"
    r6 = lambda e: r_out_sql(e, 6)
    return d.cte_query(
        list(lead_ctes or [])
        + [
            (
                "scored",
                f"SELECT doc_id, source, {score_q} AS s FROM {tokh_src} "
                f"WHERE {d.size('th')} > 0",
            )
        ],
        f"""SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           {r6('sum(s) / count(*)')} AS mean_score
    FROM scored GROUP BY source""",
    )


def gopher_rules_sql(d: Dialect, table: str = "documents") -> str:
    """Gopher-style document quality rules (Rae et al. 2021, Table A1
    "quality filter heuristics" — public paper, arXiv:2112.11446):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    alphabetic-word fraction, and a minimum-stopword requirement.  Every
    measure is a per-row expression over the token array — ONE scan, no
    shuffle, whole-stage codegen (at 100 TB this runs at scan speed, the
    same shape as the reference's scan-side predicates).

    Outputs the measured ratios (6-digit floor-quantized) plus the rule
    verdicts, so downstream curation can re-threshold without recomputing.
    """
    toks = d.tokens("lower(text)")
    if d.engine == "spark":
        alpha = d.filter("toks", "t", "t RLIKE '^[a-z]+$'")
    else:
        alpha = d.filter("toks", "t", "regexp_matches(t, '^[a-z]+$')")
    sum_len = d.fold(d.transform("toks", "t", "length(t)"), "x", "acc", "acc + x")
    stop_hits = _stop_hits(d, "toks", "en")
    hashes = "length(text) - length(replace(text, '#', ''))"
    ellipses = d.size(d.regexp_extract_all("text", r"\.\.\."))
    r6 = lambda e: r_out_sql(e, 6)
    return d.cte_query(
        [
            ("t", f"SELECT doc_id, source, {toks} AS toks, text FROM {table}"),
            (
                "m",
                f"""SELECT doc_id, source,
             CAST({d.size('toks')} AS BIGINT) AS n_words,
             CAST({sum_len} AS BIGINT) AS sum_word_len,
             CAST({d.size(alpha)} AS BIGINT) AS n_alpha_words,
             CAST({stop_hits} AS BIGINT) AS stop_hits,
             CAST({hashes} + {ellipses} AS BIGINT) AS n_symbols
      FROM t WHERE {d.size('toks')} > 0""",
            ),
        ],
        f"""SELECT doc_id, source, n_words,
           {r6('CAST(sum_word_len AS DOUBLE) / n_words')} AS mean_word_len,
           {r6('CAST(n_alpha_words AS DOUBLE) / n_words')} AS frac_alpha,
           {r6('CAST(n_symbols AS DOUBLE) / n_words')} AS symbol_ratio,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
           (CAST(sum_word_len AS DOUBLE) / n_words >= 3.0
            AND CAST(sum_word_len AS DOUBLE) / n_words <= 10.0) AS ok_mean_len,
           (CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8) AS ok_alpha,
           (CAST(n_symbols AS DOUBLE) / n_words <= 0.1) AS ok_symbols,
           (stop_hits >= 2) AS ok_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND CAST(sum_word_len AS DOUBLE) / n_words >= 3.0
            AND CAST(sum_word_len AS DOUBLE) / n_words <= 10.0
            AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8
            AND CAST(n_symbols AS DOUBLE) / n_words <= 0.1
            AND stop_hits >= 2) AS keep
    FROM m""",
    )


def surprisal_sql(d: Dialect, table: str = "documents", tokh_src: str | None = None) -> str:
    """Unigram language-model surprisal scoring — the cheap perplexity
    proxy LLM pipelines use as a fluency/quality signal (public: Wenzek
    et al. 2019 "CCNet" uses LM perplexity for corpus filtering; the
    unigram variant needs no trained model, just corpus statistics).

    p(token) = corpus_count(token_hash) / total_tokens; per doc emit the
    mean surprisal  -ln p  over its tokens.  Cross-engine determinism:
    each addend is dyadically quantized (2^-20) before the per-doc sum,
    so reduction order cannot move the result; ln() outputs are rounded
    through the same floor form both sides (transcendental tolerance,
    same profile as bm25_sql's ln terms).

    Scale shape: ONE corpus scan builds the token-frequency table (hash
    keyed, map-side combinable), which at 100 TB is vocabulary-sized —
    broadcast to the probe join; the per-doc agg shuffles on doc_id only.
    Spark callers stage the tokh view (``tokh_src``) — the token view is
    referenced twice (probe + freq), and CTE inlining would re-run the
    per-char fold for each reference.
    """
    from incubator_horaedb_spark.operators.dedup import tokh_select

    q20 = 1 << 20
    surp = f"(CAST(floor((-ln(CAST(f.cnt AS DOUBLE) / s.total)) * {q20} + 0.5) AS DOUBLE) / {q20})"
    r6 = lambda e: r_out_sql(e, 6)
    if tokh_src is None:
        lead = [("tokh", tokh_select(d, table))]
        tokh_src = "tokh"
    else:
        lead = []
    return d.cte_query(
        lead
        + [
            ("tok", d.unnest_select("doc_id", "th", "h", tokh_src)),
            ("freq", "SELECT h, count(*) AS cnt FROM tok GROUP BY h"),
            ("stats", "SELECT sum(cnt) AS total FROM freq"),
            (
                "scored",
                f"""SELECT t.doc_id, {surp} AS sq
      FROM tok t JOIN freq f ON f.h = t.h CROSS JOIN stats s""",
            ),
        ],
        f"""SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           {r6('sum(sq) / count(*)')} AS mean_surprisal
    FROM scored GROUP BY doc_id""",
    )


# Count-min sketch parameters: depth 4 x width 512 cells.  The hash family
# reuses the affine-permutation constants pattern (public Knuth/xxhash
# multipliers); all arithmetic stays in int64 (h < 2^31, A < 2^32).
_CMS_W = 512
_CMS_A = (2654435761, 2246822519, 3266489917, 668265263)
_CMS_B = (101, 211, 307, 401)


def _cms_pos(j: int, h: str = "h") -> str:
    from incubator_horaedb_spark.operators.dialect import P

    return f"((({h}) * {_CMS_A[j]} + {_CMS_B[j]}) % {P} % {_CMS_W})"


def cms_heavy_hitters_sql(
    d: Dialect, table: str = "documents", k: int = 20, tokh_src: str | None = None
) -> str:
    """Count-min-sketch heavy hitters over the corpus token stream
    (Cormode & Muthukrishnan 2005, public): the token frequency sketch is
    4 x 512 counters (8 KB regardless of vocabulary size), estimates are
    min over the 4 hashed cells, and the one-sided error guarantee
    (estimate >= true count) is tested as an invariant.

    At 100 TB the sketch build is ONE map-side-combinable aggregate into
    2048 cells — no vocabulary-sized shuffle — and the candidate ranking
    joins the tiny cell table 4 times by broadcast.  Deterministic hashes
    on both engines make even the sketch's collisions identical, so the
    result is exactly oracle-checkable (same property as the Bloom
    decontaminator).  Output: top-k token hashes by estimated count with
    the exact count alongside (estimate >= exact, both returned)."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    cell_union = "\n      UNION ALL\n      ".join(
        f"SELECT {j} AS row_idx, {_cms_pos(j)} AS pos, cnt FROM freq" for j in range(4)
    )
    est = "least(" + ", ".join(f"c{j}.cell_cnt" for j in range(4)) + ")"
    cell_joins = "\n      ".join(
        f"JOIN cells c{j} ON c{j}.row_idx = {j} AND c{j}.pos = {_cms_pos(j, 'f.h')}"
        for j in range(4)
    )
    if tokh_src is None:
        lead = [("tokh", tokh_select(d, table))]
        tokh_src = "tokh"
    else:
        lead = []
    return d.cte_query(
        lead
        + [
            ("tok", d.unnest_select("doc_id", "th", "h", tokh_src)),
            ("freq", "SELECT h, count(*) AS cnt FROM tok GROUP BY h"),
            (
                "cells",
                f"""SELECT row_idx, pos, sum(cnt) AS cell_cnt FROM (
      {cell_union}
      ) u GROUP BY row_idx, pos""",
            ),
            (
                "est",
                f"""SELECT f.h, f.cnt AS exact_cnt, {est} AS est_cnt
      FROM freq f
      {cell_joins}""",
            ),
            (
                "ranked",
                f"""SELECT h, exact_cnt, est_cnt,
             row_number() OVER (ORDER BY est_cnt DESC, h) AS rn
      FROM (SELECT h, exact_cnt, est_cnt FROM est
            ORDER BY est_cnt DESC, h LIMIT {k}) topk_""",
            ),
        ],
        f"""SELECT CAST(h AS BIGINT) AS token_hash,
           CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(est_cnt AS BIGINT) AS est_cnt
    FROM ranked WHERE rn <= {k}""",
    )


def doc_cluster_sql(d: Dialect, table: str = "documents", k: int = 4) -> str:
    """Document clustering over hashed features: assign every document's
    normalized FEATURE_DIM hash-bucket vector to the nearest of ``k``
    seed-document centroids (squared L2, deterministic seed = the k
    lowest doc_ids — the k-means++-style init a full Lloyd run would
    start from; operators/similarity.py owns the iterated-Lloyd path for
    embeddings).  Features are 2^-20-quantized rationals, so distances
    are EXACT dyadic sums — no tie guard needed beyond the cid order.

    Scale shape: featurization is map-side (zero shuffle); the centroid
    table is k rows (broadcast); assignment is one narrow cross join +
    per-doc top-1; the summary aggregates k rows.  The canonical corpus
    topic-bucketing pass before per-cluster sampling."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    q20 = 1 << 20
    fcols = ",\n             ".join(
        f"CAST({d.size(d.filter('th', 't', f't % {FEATURE_DIM} = {j}'))} AS BIGINT) AS f{j}"
        for j in range(FEATURE_DIM)
    )
    gcols = ",\n             ".join(
        f"(CAST(floor((CAST(f{j} AS DOUBLE) / n_tokens) * {q20} + 0.5) AS DOUBLE) / {q20}) AS g{j}"
        for j in range(FEATURE_DIM)
    )
    ccols = ", ".join(f"g{j} AS c{j}" for j in range(FEATURE_DIM))
    dist = " + ".join(
        f"(g.g{j} - c.c{j}) * (g.g{j} - c.c{j})" for j in range(FEATURE_DIM)
    )
    return d.cte_query(
        [
            ("tokh", tokh_select(d, table)),
            (
                "feats",
                f"""SELECT doc_id, CAST({d.size('th')} AS BIGINT) AS n_tokens,
             {fcols}
      FROM tokh WHERE {d.size('th')} > 0""",
            ),
            (
                "g",
                f"""SELECT doc_id,
             {gcols}
      FROM feats""",
            ),
            ("cent", f"SELECT doc_id AS cid, {ccols} FROM g WHERE doc_id < {k}"),
            (
                "pick",
                f"""SELECT g.doc_id, c.cid,
             row_number() OVER (PARTITION BY g.doc_id
                                ORDER BY {dist}, c.cid) AS rn
      FROM g CROSS JOIN cent c""",
            ),
        ],
        """SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(sum(doc_id) AS BIGINT) AS member_checksum
    FROM pick WHERE rn = 1 GROUP BY cid""",
    )


# ------------------------------------------- BPE pair statistics --
def bpe_pair_counts_sql(d: Dialect, table: str = "documents", k: int = 30) -> str:
    """One BPE merge iteration's pair statistics: corpus-weighted adjacent
    character-pair frequencies — the inner loop of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016, public algorithm).

    Shape matters at 100 TB: the classic efficiency trick is to count
    pairs over the DISTINCT word vocabulary weighted by word frequency,
    not over the raw corpus — one map-side-combinable word-count shuffle
    collapses the corpus to a vocab that is orders of magnitude smaller,
    and the per-character explode then runs on vocab rows only.  Ties
    break lexicographically so the top-k is total-ordered on both
    engines."""
    words = d.tokens("lower(text)")
    pair = "substr(word, i, 2)"
    pairs_arr = d.transform(d.range1("length(word) - 1"), "i", pair)
    return d.cte_query(
        [
            ("w", d.unnest_select("doc_id", words, "word", table)),
            (
                "vocab",
                "SELECT word, count(*) AS wc FROM w "
                "WHERE length(word) >= 2 GROUP BY word",
            ),
            ("vp", d.unnest_select("wc", pairs_arr, "pair", "vocab")),
            (
                "pc",
                "SELECT pair, sum(wc) AS pair_count FROM vp GROUP BY pair",
            ),
        ],
        "SELECT pair, CAST(pair_count AS BIGINT) AS pair_count "
        f"FROM pc ORDER BY pair_count DESC, pair LIMIT {k}",
    )


# ------------------------------------------- bigram LM surprisal --
def bigram_surprisal_sql(
    d: Dialect, table: str = "documents", tokh_src: str | None = None
) -> str:
    """Bigram language-model surprisal — the next rung above
    :func:`surprisal_sql`'s unigram proxy (public: CCNet-style LM
    filtering, Wenzek et al. 2019; a count-based bigram LM needs only
    corpus statistics).  Per doc: mean of -ln p(w_i | w_{i-1}) with
    p = c(w_{i-1} w_i) / c(w_{i-1} ·).

    The trick that keeps this ONE unnest instead of a struct explode: the
    bigram key is ``ctx_h * 2^31 + next_h`` (both hashes < 2^31, so the
    packed key fits int64 exactly) — the context hash is recovered later
    as ``key DIV 2^31``, so the conditional denominator c(w1 ·) is a
    GROUP BY over the same exploded rows, no second explode and no struct
    columns.

    Scale shape: bigram and context frequency tables are vocabulary²- and
    vocabulary-sized (map-side combinable counts; broadcast to the probe
    join at 100 TB); the per-doc mean shuffles on doc_id only.  Addends
    are dyadically quantized before the per-doc sum (reduction-order-
    proof); ln() rounds through the same floor form on both engines."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    shift = 1 << 31
    q20 = 1 << 20
    bg = f"({d.at('th', 'i')}) * CAST({shift} AS BIGINT) + ({d.at('th', 'i + 1')})"
    bgs = d.transform(d.range1(f"{d.size('th')} - 1"), "i", bg)
    surp = (
        f"(CAST(floor((-ln(CAST(b.cnt AS DOUBLE) / CAST(c.cnt AS DOUBLE)))"
        f" * {q20} + 0.5) AS DOUBLE) / {q20})"
    )
    r6 = (
        f"(CAST(floor((sum(sq) / count(*)) * CAST(1000000 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) AS DOUBLE) / CAST(1000000 AS DOUBLE))"
    )
    if tokh_src is None:
        lead = [("tokh", tokh_select(d, table))]
        tokh_src = "tokh"
    else:
        lead = []
    return d.cte_query(
        lead
        + [
            (
                "bg",
                f"SELECT doc_id, bgk, {d.idiv('bgk', str(shift))} AS ctx "
                f"FROM ({d.unnest_select('doc_id', bgs, 'bgk', tokh_src)}) x",
            ),
            ("bfreq", "SELECT bgk, count(*) AS cnt FROM bg GROUP BY bgk"),
            ("cfreq", "SELECT ctx, count(*) AS cnt FROM bg GROUP BY ctx"),
            (
                "scored",
                f"""SELECT g.doc_id, {surp} AS sq
      FROM bg g JOIN bfreq b ON b.bgk = g.bgk JOIN cfreq c ON c.ctx = g.ctx""",
            ),
        ],
        f"""SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           {r6} AS mean_bigram_surprisal
    FROM scored GROUP BY doc_id""",
    )


# ------------------------------------------- TF-IDF keyword extraction --
def tfidf_tok_select(d: Dialect, table: str = "documents") -> str:
    """Stage 1: the exploded (doc_id, term) stream.  Spark callers MUST
    materialize this as a cached view — tf and df both consume it, and
    CTE inlining would otherwise scan + re-split the corpus twice."""
    return (
        f"SELECT doc_id, term FROM "
        f"({d.unnest_select('doc_id', d.tokens('lower(text)'), 'term', table)}) x "
        f"WHERE length(term) >= 2"
    )


def tfidf_topk_from(
    d: Dialect, tok_src: str, table: str = "documents",
    k: int = 3, lead_ctes: list | None = None,
) -> str:
    """Per-document top-k keywords by TF-IDF (Sparck Jones 1972; the
    classic relevance weight, same ln-idf family as bm25_sql).  Terms stay
    literal strings — no hashing needed, both engines tokenize with the
    same literal-space split — so the output is human-auditable.

    Scale shape: one explode to (doc, term) feeds BOTH frequency tables
    (per-doc tf and corpus df) as map-side-combinable counts; df is
    vocabulary-sized and broadcast to the probe join at 100 TB; the final
    per-doc top-k is a row_number window partitioned by doc_id.  Ties
    break (score DESC, term ASC) so the k rows are engine-stable.

    Determinism: tf and df are exact integers; the single ln() rounds
    through the tie-proof floor form (transcendental tolerance, same
    profile as bm25/surprisal); the tf x idf product quantizes once more
    before ranking."""
    q6 = "CAST(1000000 AS DOUBLE)"
    idf = (
        "(CAST(floor(ln((CAST(s.n_docs AS DOUBLE) + 1.0) / (CAST(f.df AS DOUBLE) + 1.0))"
        f" * {q6} + 0.5) AS DOUBLE) / {q6})"
    )
    score = (
        f"(CAST(floor(CAST(t.tf AS DOUBLE) * {idf} * {q6}"
        f" + CAST(0.5 AS DOUBLE)) AS DOUBLE) / {q6})"
    )
    return d.cte_query(
        list(lead_ctes or [])
        + [
            ("tf", f"SELECT doc_id, term, count(*) AS tf FROM {tok_src} GROUP BY doc_id, term"),
            ("df", f"SELECT term, count(DISTINCT doc_id) AS df FROM {tok_src} GROUP BY term"),
            ("nd", f"SELECT count(*) AS n_docs FROM {table}"),
            (
                "scored",
                f"""SELECT t.doc_id, t.term, {score} AS tfidf
      FROM tf t JOIN df f ON f.term = t.term CROSS JOIN nd s""",
            ),
            (
                "ranked",
                """SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored""",
            ),
        ],
        f"SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= {k}",
    )


def tfidf_topk_sql(d: Dialect, table: str = "documents", k: int = 3) -> str:
    """One-shot rendering (oracle side)."""
    return tfidf_topk_from(
        d, "tok", table, k, lead_ctes=[("tok", tfidf_tok_select(d, table))]
    )


# ------------------------------------------- language-ID quality audit --
def langid_confusion_sql(d: Dialect, table: str = "documents") -> str:
    """Language-ID confusion matrix: predicted vs actual label counts plus
    per-cell share of the actual language's documents — the classifier
    quality audit that gates whether the heuristic is good enough to
    drive corpus filtering (run it BEFORE trusting langid to route data).
    Composes the langid operator unchanged; one extra (actual, pred)
    hash agg over its output and a window share."""
    return d.cte_query(
        [("scored", langid_sql(d, table))],
        """SELECT actual_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           (CAST(floor((CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER (PARTITION BY actual_lang) AS DOUBLE))
                 * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
            / CAST(1000000 AS DOUBLE)) AS share_of_actual
    FROM scored
    GROUP BY actual_lang, pred_lang""",
    )


# ------------------------------------------- BPE merge training --
BPE_ROUNDS = 3


def bpe_apply_merge(d: Dialect, ws: str, a: str, b: str) -> str:
    """Apply ONE BPE merge (a, b) to a '·'-joined symbol string — greedy
    left-to-right non-overlapping, the original algorithm's semantics
    (Sennrich et al. 2016): fold over the symbols building the new
    representation; when the accumulator's LAST symbol is exactly ``a``
    and the incoming symbol is ``b``, fuse them (the fused symbol a||b no
    longer equals a, so overlapping occurrences like 'aaa' under (a,a)
    merge pairwise exactly like the reference implementation).  The
    '·' separator cannot appear inside symbols (word chars only), and the
    last-symbol test is exact substring arithmetic — no LIKE, so symbols
    containing pattern metacharacters cannot mis-match."""
    syms = d.split_lit(ws, "·")
    ends_with_a = (
        f"(acc = {a} OR (length(acc) > length({a}) "
        f"AND substr(acc, length(acc) - length({a}), 1) = '·' "
        f"AND substr(acc, length(acc) - length({a}) + 1) = {a}))"
    )
    body = (
        f"CASE WHEN acc = '' THEN s "
        f"WHEN {ends_with_a} AND s = {b} "
        f"THEN substr(acc, 1, length(acc) - length({a})) || {a} || {b} "
        f"ELSE acc || '·' || s END"
    )
    return d.fold_str(syms, "s", "acc", body)


def bpe_round_ctes(
    d: Dialect, prev: str, r: int, carry: str = "wc"
) -> list[tuple[str, str]]:
    """One BPE training round over the weighted symbolized vocabulary
    ``prev`` (word_syms, wc[, carry]): count adjacent symbol pairs, take
    the argmax (count desc, pair asc — total order), apply the merge.
    ``carry`` lists the columns propagated through the merge application
    (the encode path carries ``word`` so the final table maps each vocab
    word to its symbolization)."""
    syms = d.split_lit("word_syms", "·")
    pair = f"({d.at(syms, 'i')}) || '·' || ({d.at(syms, 'i + 1')})"
    pairs_arr = d.transform(d.range1(f"{d.size(syms)} - 1"), "i", pair)
    return [
        (f"p{r}", d.unnest_select("wc", pairs_arr, "pr", prev)),
        (
            f"m{r}",
            f"""SELECT pr, sum(wc) AS pair_count,
             {d.at(d.split_lit("pr", "·"), "1")} AS a,
             {d.at(d.split_lit("pr", "·"), "2")} AS b
      FROM p{r} GROUP BY pr ORDER BY sum(wc) DESC, pr LIMIT 1""",
        ),
        (
            f"v{r}",
            f"SELECT {bpe_apply_merge(d, 'word_syms', 'm.a', 'm.b')} AS word_syms, {carry} "
            f"FROM {prev} CROSS JOIN m{r} m",
        ),
    ]


def bpe_vocab_ctes(
    d: Dialect, table: str, w_cols: str = "doc_id", carry: str = "wc"
) -> list[tuple[str, str]]:
    """Weighted word vocabulary, symbolized at the character level —
    the classic BPE efficiency trick: train over DISTINCT words weighted
    by frequency, never the raw corpus (one map-side-combinable word
    count collapses 100 TB of text to a vocabulary-sized table; every
    training round then runs on vocab rows only)."""
    words = d.tokens("lower(text)")
    chars = d.transform(d.range1("length(word)"), "j", "substr(word, j, 1)")
    return [
        ("w", d.unnest_select(w_cols, words, "word", table)),
        (
            "vocab",
            "SELECT word, count(*) AS wc FROM w WHERE length(word) >= 2 GROUP BY word",
        ),
        ("v0", f"SELECT {d.join_arr(chars, '·')} AS word_syms, {carry} FROM vocab"),
    ]


def bpe_train_merges_sql(d: Dialect, table: str = "documents", rounds: int = BPE_ROUNDS) -> str:
    """One-shot rendering: BPE tokenizer training, ``rounds`` merge
    iterations (Sennrich et al. 2016) — returns the learned merge table
    (round, sym_a, sym_b, merged, pair_count), the artifact a tokenizer
    ships.  Iterative-operator shape: each round is a vocab-sized explode
    + tiny argmax + merge application; the Spark side executes the same
    round templates imperatively with lineage truncation
    (querybank/llm_ops.py), the oracle unrolls them in CTEs."""
    ctes = bpe_vocab_ctes(d, table)
    for r in range(1, rounds + 1):
        ctes += bpe_round_ctes(d, f"v{r - 1}", r)
    final = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b, a || b AS merged, "
        f"CAST(pair_count AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return d.cte_query(ctes, final)


# ------------------------------------------- winnow decontamination --
def winnow_decontam_sql(
    d: Dialect,
    table: str = "documents",
    tokh_src: str | None = None,
    k: int = 3,
    w: int = 4,
    top_n: int = 20,
) -> str:
    """Exact-substring benchmark decontamination via winnowing (MOSS,
    Schleimer et al. SIGMOD'03): any training doc sharing a token run of
    >= w+k-1 tokens with a benchmark doc is GUARANTEED to share a winnow
    fingerprint — the char/token-exact contamination detector that token
    3-gram Jaccard (decontaminate_ngram) only approximates, at ~2/(w+1)
    of the k-gram storage.

    Benchmark slice = doc_id % 97 == 0 (the decontamination convention,
    operators/pipeline.py::BENCH_MOD).  Scale shape: benchmark fingerprints
    collapse to a DISTINCT vocabulary (tiny — broadcast at 100 TB); the
    training side explodes its winnow fingerprints (already ~2/(w+1)
    sparser than k-grams) into one equi-join + per-doc count.  Output is
    the top-``top_n`` most-contaminated docs (share desc, doc_id — total
    order), robust to corpus-dependent chance-overlap levels."""
    from incubator_horaedb_spark.operators.dedup import tokh_select
    from incubator_horaedb_spark.operators.dialect import BASE, P

    combo = "CAST(0 AS BIGINT)"
    for i in range(k):
        combo = f"(({combo}) * {BASE} + {d.at('th', f'i + {i}')}) % {P}"
    kgrams = d.transform(d.range1(f"{d.size('th')} - {k - 1}"), "i", combo)
    mins = d.transform(
        d.range1(f"{d.size('kg')} - {w - 1}"), "i", d.arr_min(d.slice_("kg", "i", str(w)))
    )
    share = (
        "(CAST(floor((CAST(n_shared AS DOUBLE) / CAST(n_fp AS DOUBLE))"
        " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE))"
    )
    if tokh_src is None:
        lead = [("tokh", tokh_select(d, table))]
        tokh_src = "tokh"
    else:
        lead = []
    return d.cte_query(
        lead
        + [
            (
                "kg",
                f"SELECT doc_id, {kgrams} AS kg FROM {tokh_src} "
                f"WHERE {d.size('th')} >= {k}",
            ),
            (
                "wf",
                f"SELECT doc_id, {d.distinct(mins)} AS wf FROM kg "
                f"WHERE {d.size('kg')} >= {w}",
            ),
            (
                "bfp",
                f"SELECT DISTINCT fp FROM ("
                f"{d.unnest_select('doc_id', 'wf', 'fp', 'wf')}"
                f") b WHERE doc_id % 97 = 0",
            ),
            (
                "tx",
                f"SELECT doc_id, {d.size('wf')} AS n_fp, fp FROM ("
                f"{d.unnest_select(f'doc_id, wf', 'wf', 'fp', 'wf')}"
                f") t WHERE doc_id % 97 <> 0",
            ),
            (
                "hit",
                """SELECT tx.doc_id, tx.n_fp, count(*) AS n_shared
      FROM tx JOIN bfp ON bfp.fp = tx.fp
      GROUP BY tx.doc_id, tx.n_fp""",
            ),
            (
                "ranked",
                f"""SELECT doc_id, n_fp, n_shared, shared_fp_share,
             row_number() OVER (ORDER BY shared_fp_share DESC, doc_id) AS rn
      FROM (SELECT doc_id, CAST(n_fp AS BIGINT) AS n_fp,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   {share} AS shared_fp_share
            FROM hit
            ORDER BY {share} DESC, doc_id LIMIT {top_n}) topk_""",
            ),
        ],
        f"SELECT doc_id, n_fp, n_shared, shared_fp_share FROM ranked WHERE rn <= {top_n}",
    )


# ------------------------------------------- source distribution drift --
def source_divergence_sql(
    d: Dialect, table: str = "documents", tokh_src: str | None = None
) -> str:
    """Per-source token-distribution drift: KL(p_source || p_corpus) over
    token unigram distributions — the corpus-mixing health metric (a
    source whose KL spikes has drifted from the mix it was weighted for;
    public technique: distributionally-weighted data selection à la
    DoReMi / CCNet domain scoring).

    KL = Σ_t p_s(t) · ln(p_s(t) / p(t)); every term is quantized to a
    2^-20 dyadic before the per-source sum, so summation order cannot
    move the result (both engines' ln agree after quantization — the same
    contract as the surprisal scorers).  Scale shape: one token explode
    feeds BOTH the per-(source, token) and the corpus-token counts (a
    second small agg over the first); the join keys are token hashes —
    co-partitioned, broadcastable corpus side at 100 TB."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    q20 = 1 << 20
    term = (
        f"(CAST(floor(((CAST(st.c AS DOUBLE) / CAST(sn.n AS DOUBLE))"
        f" * ln((CAST(st.c AS DOUBLE) / CAST(sn.n AS DOUBLE))"
        f" / (CAST(ct.c AS DOUBLE) / CAST(cn.n AS DOUBLE))))"
        f" * {q20} + 0.5) AS DOUBLE) / {q20})"
    )
    r6 = lambda e: r_out_sql(e, 6)
    if tokh_src is None:
        lead = [("tokh", tokh_select(d, table, extra_cols="source"))]
        tokh_src = "tokh"
    else:
        lead = []
    return d.cte_query(
        lead
        + [
            ("ex", d.unnest_select("doc_id, source", "th", "h", tokh_src)),
            ("st", "SELECT source, h, count(*) AS c FROM ex GROUP BY source, h"),
            ("sn", "SELECT source, sum(c) AS n FROM st GROUP BY source"),
            ("ct", "SELECT h, sum(c) AS c FROM st GROUP BY h"),
            ("cn", "SELECT sum(c) AS n FROM ct"),
            (
                "terms",
                f"""SELECT st.source, {term} AS kl_term
      FROM st
      JOIN sn ON sn.source = st.source
      JOIN ct ON ct.h = st.h
      CROSS JOIN cn""",
            ),
        ],
        f"""SELECT source,
           {r6('sum(kl_term)')} AS kl_divergence,
           CAST(count(*) AS BIGINT) AS n_distinct_tokens
    FROM terms GROUP BY source""",
    )


def bpe_encode_report_from(d: Dialect, w_src: str, enc_src: str) -> str:
    """Per-source encode report from a (doc_id, source, word) stream and a
    (word, word_syms) final-symbolization table: word count, total chars,
    total BPE tokens, compression ratio.  Words below the vocab length
    floor (length 1) encode as themselves — the LEFT JOIN's NULL branch."""
    r6 = lambda e: r_out_sql(e, 6)
    n_sym = d.size(d.split_lit("e.word_syms", "·"))
    return f"""SELECT w.source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(w.word)) AS BIGINT) AS n_chars,
           CAST(sum(coalesce({n_sym}, 1)) AS BIGINT) AS n_tokens,
           {r6(f"CAST(sum(length(w.word)) AS DOUBLE) / CAST(sum(coalesce({n_sym}, 1)) AS DOUBLE)")}
               AS chars_per_token
    FROM {w_src} w LEFT JOIN {enc_src} e ON e.word = w.word
    GROUP BY w.source
    ORDER BY w.source"""


def bpe_encode_corpus_sql(d: Dialect, table: str = "documents", rounds: int = BPE_ROUNDS) -> str:
    """Corpus BPE encoding + compression report — the APPLY side of the
    tokenizer lifecycle (bpe_train_merges learns the merge table; this
    measures what shipping it buys): train ``rounds`` merges over the
    weighted vocabulary, encode every word by its final symbolization,
    and report per-source word/char/token totals and chars-per-token —
    the number a tokenizer team tracks across corpus versions.

    Scale shape: training runs on vocab rows (the corpus-collapses-to-
    vocab trick); encoding is a LEFT JOIN of the (doc, word) stream
    against the vocab-sized symbolization table — word-keyed, hot words
    (stopwords) are exactly the skew AQE's join splitting handles, and
    at real scale the symbolization table broadcasts.  All-integer
    totals; the single ratio divides two exact integers."""
    ctes = bpe_vocab_ctes(d, table, w_cols="doc_id, source", carry="word, wc")
    for r in range(1, rounds + 1):
        ctes += bpe_round_ctes(d, f"v{r - 1}", r, carry="word, wc")
    return d.cte_query(ctes, bpe_encode_report_from(d, "w", f"v{rounds}"))


def doc_cluster_quality_sql(d: Dialect, table: str = "documents", k: int = 4) -> str:
    """Cluster-quality report for the doc_cluster_assign pass: per
    cluster, the mean SIMPLIFIED SILHOUETTE s = (d2 − d1)/max(d1, d2)
    (Hruschka et al.'s centroid-distance variant of Rousseeuw 1987,
    public — d1 = distance to the assigned centroid, d2 = to the
    second-nearest) plus mean assigned distance — the eval that decides
    whether k fits the corpus before per-cluster sampling trusts the
    buckets (the clustering twin of ann_recall_at_k).

    Determinism: distances are exact dyadic sums (doc_cluster_sql's
    quantized features), the silhouette divides identical doubles, and
    per-doc silhouettes are 2^-20-quantized before the mean (exact
    addition).  Shape: identical to the assignment pass (broadcast k-row
    centroid table, per-doc top-2 instead of top-1) + one k-row agg."""
    from incubator_horaedb_spark.operators.dedup import tokh_select

    q20 = 1 << 20
    fcols = ",\n             ".join(
        f"CAST({d.size(d.filter('th', 't', f't % {FEATURE_DIM} = {j}'))} AS BIGINT) AS f{j}"
        for j in range(FEATURE_DIM)
    )
    gcols = ",\n             ".join(
        f"(CAST(floor((CAST(f{j} AS DOUBLE) / n_tokens) * {q20} + 0.5) AS DOUBLE) / {q20}) AS g{j}"
        for j in range(FEATURE_DIM)
    )
    ccols = ", ".join(f"g{j} AS c{j}" for j in range(FEATURE_DIM))
    dist = " + ".join(
        f"(g.g{j} - c.c{j}) * (g.g{j} - c.c{j})" for j in range(FEATURE_DIM)
    )
    qz = lambda e: dyadic_sql(e, 20)
    r6 = lambda e: r_out_sql(e, 6)
    sil = "CASE WHEN greatest(d1, d2) = 0 THEN 0.0 ELSE (d2 - d1) / greatest(d1, d2) END"
    return d.cte_query(
        [
            ("tokh", tokh_select(d, table)),
            (
                "feats",
                f"""SELECT doc_id, CAST({d.size('th')} AS BIGINT) AS n_tokens,
             {fcols}
      FROM tokh WHERE {d.size('th')} > 0""",
            ),
            (
                "g",
                f"""SELECT doc_id,
             {gcols}
      FROM feats""",
            ),
            ("cent", f"SELECT doc_id AS cid, {ccols} FROM g WHERE doc_id < {k}"),
            (
                "pick",
                f"""SELECT g.doc_id, c.cid, {dist} AS dst,
             row_number() OVER (PARTITION BY g.doc_id
                                ORDER BY {dist}, c.cid) AS rn
      FROM g CROSS JOIN cent c""",
            ),
            (
                "dd",
                """SELECT doc_id,
             min(CASE WHEN rn = 1 THEN cid END) AS cid,
             min(CASE WHEN rn = 1 THEN dst END) AS d1,
             min(CASE WHEN rn = 2 THEN dst END) AS d2
      FROM pick WHERE rn <= 2 GROUP BY doc_id""",
            ),
        ],
        f"""SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           {r6(f"sum({qz(sil)}) / CAST(count(*) AS DOUBLE)")} AS mean_silhouette,
           {r6(f"sum({qz('d1')}) / CAST(count(*) AS DOUBLE)")} AS mean_d1
    FROM dd GROUP BY cid
    ORDER BY cid""",
    )
