"""Blocked-GEMM similarity operators: oracle parity + block composition.

The oracle-hash gate for these queries runs in tools/check_correctness.py;
here we pin (a) the top-k ANN result against DuckDB at sf0.001 and (b) the
scale-path property that per-block top-k + one re-rank window equals the
single-block answer (the 100 TB execution shape).
"""

from __future__ import annotations

import duckdb

from incubator_horaedb_spark.operators import similarity
from incubator_horaedb_spark.operators.dialect import DUCK
from incubator_horaedb_spark.querybank.registry import load


def _digest(cols, rows):
    from tools.check_correctness import table_digest

    return table_digest(cols, [tuple(r) for r in rows])


def test_blocked_topk_matches_duckdb_oracle(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    sdf = similarity.blocked_topk(emb, k=5, n_queries=10)
    srows = sdf.collect()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    res = con.execute(similarity.blocked_topk_oracle_sql(DUCK, k=5, n_queries=10))
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert len(srows) == len(orows)
    assert _digest(sdf.columns, srows) == _digest(ocols, orows)


def test_blocked_topk_block_composition(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").cache()
    whole = similarity.blocked_topk(emb, k=5, n_queries=10)
    blocks = [
        emb.where(emb.vec_id % 2 == 0),
        emb.where(emb.vec_id % 2 == 1),
    ]
    composed = similarity.blocked_topk_over_blocks(emb, blocks, k=5, n_queries=10)
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in composed.collect())
    assert a == b
