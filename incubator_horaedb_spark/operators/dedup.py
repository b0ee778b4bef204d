"""Document deduplication operators (beyond-reference, LLM-pipeline grade).

Four strategies over the ``documents`` table, each defined once as a
dual-dialect SQL template (operators/dialect.py) so the Spark pipeline and
the DuckDB oracle share every arithmetic step:

- exact            — hash-groupBy on normalized text.
- minhash_lsh      — shingle → MinHash signature → banded LSH buckets →
                     candidate pairs → exact-Jaccard verification.  The
                     100 TB path: candidates come from an equi-join on
                     (band, key), never an all-pairs product.
- simhash          — 16-bit SimHash + 4-band LSH; banding is lossless for
                     hamming ≤ 3 (pigeonhole), so results equal the
                     all-pairs oracle by construction.
- ngram_jaccard    — exact all-pairs token-3-gram Jaccard (the small-scale
                     baseline the LSH variants approximate).

Scale notes: minhash_lsh shuffles (doc → band keys) once and joins on
band keys — at 1000 executors the band key space keeps the join balanced;
hot bands (boilerplate docs) can be salted by appending a shard of
hash(doc_id).  The exact all-pairs variants are quadratic and exist as
correctness baselines, marked as such.
"""

from __future__ import annotations

import random

from incubator_horaedb_spark.operators.dialect import DUCK, P, SPARK, Dialect

NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = 4
assert NUM_PERM == BANDS * ROWS_PER_BAND

_rng = random.Random(42)
PERM_A = [(_rng.randrange(1, P - 1) | 1) for _ in range(NUM_PERM)]
PERM_B = [_rng.randrange(0, P - 1) for _ in range(NUM_PERM)]


def _int_array(d: Dialect, values: list[int]) -> str:
    items = ", ".join(f"CAST({v} AS BIGINT)" for v in values)
    return f"array({items})" if d.engine == "spark" else f"[{items}]"


def _to_str(d: Dialect, x: str) -> str:
    t = "STRING" if d.engine == "spark" else "VARCHAR"
    return f"CAST({x} AS {t})"


def exact_dedup_sql(d: Dialect, table: str = "documents") -> str:
    """Exact dedup: group rows by normalized text, keep the smallest id."""
    norm = d.regexp_replace_all("lower(text)", " +", " ")
    return f"""
    SELECT min(doc_id) AS rep_doc_id,
           count(*) AS n_copies
    FROM {table}
    GROUP BY {norm}
    """


def _shingle_cte(d: Dialect, table: str) -> str:
    shingles = d.distinct(d.shingles(d.tokens("text"), k=3))
    return f"""
    sh AS (
      SELECT doc_id, {shingles} AS shingles
      FROM {table}
    ),
    hs AS (
      SELECT doc_id, shingles, {d.hash_list("shingles")} AS hashes
      FROM sh
      WHERE {d.size("shingles")} > 0
    )"""


def _jaccard(d: Dialect, a: str, b: str) -> str:
    inter = d.size(d.intersect(a, b))
    return f"CAST({inter} AS DOUBLE) / ({d.size(a)} + {d.size(b)} - {inter})"


def minhash_lsh_sql(d: Dialect, table: str = "documents", threshold: float = 0.8) -> str:
    """MinHash + banded LSH + exact verification."""
    # signature: for each permutation i, min over shingle hashes of (a_i*h + b_i) mod P
    perm = (
        f"({d.at(_int_array(d, PERM_A), 'i')} * h + {d.at(_int_array(d, PERM_B), 'i')}) % {P}"
    )
    sig = d.transform(d.range1(str(NUM_PERM)), "i", d.arr_min(d.transform("hashes", "h", perm)))
    # band key: the ROWS_PER_BAND signature slots of band b, stringified
    key_parts = " || '_' || ".join(
        _to_str(d, d.at("sig", f"({ROWS_PER_BAND} * (b - 1) + {r + 1})"))
        for r in range(ROWS_PER_BAND)
    )
    band_range = (
        f"(SELECT explode(sequence(1, {BANDS})) AS b)"
        if d.engine == "spark"
        else f"(SELECT unnest(range(1, {BANDS + 1})) AS b)"
    )
    return f"""
    WITH {_shingle_cte(d, table)},
    sig AS (
      SELECT doc_id, shingles, {sig} AS sig FROM hs
    ),
    bands AS (
      SELECT doc_id, b AS band_idx, {key_parts} AS band_key
      FROM sig CROSS JOIN {band_range}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             round({_jaccard(d, "x.shingles", "y.shingles")}, 6) AS jaccard
      FROM cand c
      JOIN hs x ON x.doc_id = c.doc_a
      JOIN hs y ON y.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, jaccard
    FROM verified
    WHERE jaccard >= {threshold}
    """


SIMHASH_BITS = 16
SIMHASH_BANDS = 4
MAX_HAMMING = 3  # banding over 4 chunks is lossless for hamming <= 3


def _simhash_cte(d: Dialect, table: str) -> str:
    # weight of bit j = sum over token hashes of +/-1 by bit value
    weight = d.fold("hashes", "h", "acc", f"acc + ((({d.shr('h', '(j - 1)')}) & 1) * 2 - 1)")
    bit_contrib = f"CASE WHEN ({weight}) > 0 THEN {d.shl('1', '(j - 1)')} ELSE CAST(0 AS BIGINT) END"
    simhash = d.fold(d.transform(d.range1(str(SIMHASH_BITS)), "j", bit_contrib), "x", "acc", "acc + x")
    return f"""
    tok AS (
      SELECT doc_id, {d.hash_list(d.tokens("text"))} AS hashes
      FROM {table}
    ),
    sh AS (
      SELECT doc_id, {simhash} AS simhash FROM tok WHERE {d.size("hashes")} > 0
    )"""


def simhash_pairs_sql(d: Dialect, table: str = "documents") -> str:
    """SimHash near-dup pairs with hamming <= MAX_HAMMING.

    Spark side uses banded LSH (equi-join on 4-bit chunks — the scale
    path); the DuckDB oracle is the all-pairs definition.  They agree
    exactly because 4 bands of a 16-bit hash cannot all differ when the
    hamming distance is <= 3.
    """
    if d.engine == "spark":
        chunk = f"(({d.shr('simhash', f'(4 * (b - 1))')}) & 15)"
        band_range = f"(SELECT explode(sequence(1, {SIMHASH_BANDS})) AS b)"
        return f"""
        WITH {_simhash_cte(d, table)},
        bands AS (
          SELECT doc_id, simhash, b AS band_idx, {chunk} AS band_key
          FROM sh CROSS JOIN {band_range}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sim_a, b.simhash AS sim_b
          FROM bands a
          JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count{_wrap_xor(d)} AS hamming
        FROM cand
        WHERE bit_count{_wrap_xor(d)} <= {MAX_HAMMING}
        """
    return f"""
    WITH {_simhash_cte(d, table)}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a, sh b
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
    """


def _wrap_xor(d: Dialect) -> str:
    return f"({d.xor('sim_a', 'sim_b')})"


def ngram_jaccard_sql(d: Dialect, table: str = "documents", threshold: float = 0.8) -> str:
    """Exact all-pairs token-3-gram Jaccard — the quadratic baseline that
    minhash_lsh approximates (correctness anchor, not the 100 TB path)."""
    jac = _jaccard(d, "a.shingles", "b.shingles")
    return f"""
    WITH {_shingle_cte(d, table)}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round({jac}, 6) AS jaccard
    FROM hs a, hs b
    WHERE a.doc_id < b.doc_id AND round({jac}, 6) >= {threshold}
    """


def render(template_fn, **kw) -> tuple[str, str]:
    """(spark_sql, duckdb_sql) renderings of one operator template."""
    return template_fn(SPARK, **kw), template_fn(DUCK, **kw)
