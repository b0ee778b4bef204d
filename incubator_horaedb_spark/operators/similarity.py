"""Similarity search over embedding columns (beyond-reference operator).

Brute-force cosine top-k is the correctness baseline; the IVF variant is
the scale path (cluster-assign once, then search only the probed bucket —
at 100 TB the bucket assignment is a broadcast join against the centroid
table and the per-bucket top-k is a partial aggregation, never an
all-pairs product).

All math is sequential-fold double arithmetic rendered identically for
Spark and DuckDB (operators/dialect.py), so cosine values are bit-equal
across engines before the final rounding.  Per-vector norms are
precomputed in a ``normed`` stage so pair scoring does one dot product,
not three.
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


def _normed_cte(d: Dialect, table: str) -> tuple[str, str]:
    return (
        "normed",
        f"SELECT vec_id, embedding, sqrt({_dot(d, 'embedding', 'embedding')}) AS nrm "
        f"FROM {table}",
    )


def ann_bruteforce_sql(d: Dialect, table: str = "embeddings", k: int = 5, n_queries: int = 10) -> str:
    """Exact cosine top-k: first ``n_queries`` vectors against the corpus."""
    cos = f"({_dot(d, 'q.qe', 'e.embedding')}) / (q.qnrm * e.nrm)"
    return d.cte_query(
        [
            _normed_cte(d, table),
            (
                "q",
                f"SELECT vec_id AS qid, embedding AS qe, nrm AS qnrm FROM normed "
                f"WHERE vec_id < {n_queries}",
            ),
            (
                "scored",
                f"""SELECT q.qid, e.vec_id, round({cos}, 6) AS cosine
      FROM q JOIN normed e ON e.vec_id <> q.qid""",
            ),
            (
                "ranked",
                """SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored""",
            ),
        ],
        f"SELECT qid, vec_id, cosine FROM ranked WHERE rn <= {k}",
    )


def embedding_cosine_pairs_sql(d: Dialect, table: str = "embeddings", threshold: float = 0.45) -> str:
    """Embedding near-duplicate pairs: cosine >= threshold (exact variant)."""
    cos = f"({_dot(d, 'a.embedding', 'b.embedding')}) / (a.nrm * b.nrm)"
    return d.cte_query(
        [
            _normed_cte(d, table),
            (
                "pairs",
                f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS cosine
      FROM normed a JOIN normed b ON a.vec_id < b.vec_id""",
            ),
        ],
        f"SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {threshold}",
    )


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
    assign_cos = f"({_dot(d, 'e.embedding', 'c.ce')}) / (e.nrm * c.cnrm)"
    score_cos = f"({_dot(d, 'q.qe', 'a.embedding')}) / (q.qnrm * a.nrm)"
    return d.cte_query(
        [
            _normed_cte(d, table),
            (
                "cent",
                f"SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm FROM normed "
                f"WHERE vec_id < {n_centroids}",
            ),
            (
                "assigned",
                f"""SELECT vec_id, embedding, nrm, cid FROM (
        SELECT e.vec_id, e.embedding, e.nrm, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({assign_cos}, 6) DESC, c.cid) AS crn
        FROM normed e CROSS JOIN cent c
      ) t WHERE crn = 1""",
            ),
            (
                "q",
                f"SELECT vec_id AS qid, embedding AS qe, nrm AS qnrm, cid AS qcid "
                f"FROM assigned WHERE vec_id < {n_queries}",
            ),
            (
                "scored",
                f"""SELECT q.qid, a.vec_id,
             round({score_cos}, 6) AS cosine
      FROM q JOIN assigned a ON a.cid = q.qcid AND a.vec_id <> q.qid""",
            ),
            (
                "ranked",
                """SELECT qid, vec_id, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored""",
            ),
        ],
        f"SELECT qid, vec_id, cosine FROM ranked WHERE rn <= {k}",
    )
