"""Similarity search over embedding columns (beyond-reference operator).

Brute-force cosine top-k is the correctness baseline; the IVF variant is
the scale path (cluster-assign once, then search only the probed bucket —
at 100 TB the bucket assignment is a broadcast join against the centroid
table and the per-bucket top-k is a partial aggregation, never an
all-pairs product).

All math is sequential-fold double arithmetic rendered identically for
Spark and DuckDB (operators/dialect.py), so cosine values are bit-equal
across engines before the final rounding.
"""

from __future__ import annotations

from incubator_horaedb_spark.operators.dialect import Dialect

DIM = 64


def _dot(d: Dialect, a: str, b: str) -> str:
    prods = d.transform(
        d.range1(str(DIM)),
        "i",
        f"CAST({d.at(a, 'i')} AS DOUBLE) * CAST({d.at(b, 'i')} AS DOUBLE)",
    )
    if d.engine == "spark":
        return f"aggregate({prods}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), (acc, x) -> acc + x)"


def _cosine(d: Dialect, a: str, b: str) -> str:
    return f"({_dot(d, a, b)}) / (sqrt({_dot(d, a, a)}) * sqrt({_dot(d, b, b)}))"


def ann_bruteforce_sql(d: Dialect, table: str = "embeddings", k: int = 5, n_queries: int = 10) -> str:
    """Exact cosine top-k: first ``n_queries`` vectors against the corpus."""
    cos = _cosine(d, "q.qe", "e.embedding")
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM {table} WHERE vec_id < {n_queries}
    ),
    scored AS (
      SELECT q.qid, e.vec_id, round({cos}, 6) AS cosine
      FROM q JOIN {table} e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    SELECT qid, vec_id, cosine FROM ranked WHERE rn <= {k}
    """


def embedding_cosine_pairs_sql(d: Dialect, table: str = "embeddings", threshold: float = 0.45) -> str:
    """Embedding near-duplicate pairs: cosine >= threshold (exact variant)."""
    cos = _cosine(d, "a.embedding", "b.embedding")
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS cosine
      FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {threshold}
    """


def ann_ivf_sql(
    d: Dialect,
    table: str = "embeddings",
    n_centroids: int = 8,
    k: int = 3,
    n_queries: int = 10,
) -> str:
    """IVF-style ANN: deterministic centroids (first ``n_centroids``
    vectors), nearest-centroid bucket assignment (broadcast join at scale),
    then top-k within the query's probed bucket only."""
    assign_cos = _cosine(d, "e.embedding", "c.ce")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce FROM {table} WHERE vec_id < {n_centroids}
    ),
    assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({assign_cos}, 6) DESC, c.cid) AS crn
        FROM {table} e CROSS JOIN cent c
      ) t WHERE crn = 1
    ),
    q AS (
      SELECT vec_id AS qid, embedding AS qe, cid AS qcid
      FROM assigned WHERE vec_id < {n_queries}
    ),
    scored AS (
      SELECT q.qid, a.vec_id,
             round({_cosine(d, "q.qe", "a.embedding")}, 6) AS cosine
      FROM q JOIN assigned a ON a.cid = q.qcid AND a.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    )
    SELECT qid, vec_id, cosine FROM ranked WHERE rn <= {k}
    """
