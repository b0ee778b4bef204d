"""LLM-data-pipeline operators as correctness-gated queries: dedup family,
similarity search, text analysis.  Each Spark query and its DuckDB oracle
are rendered from the SAME template (operators/dialect.py), so the
portable-hash arithmetic is provably identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_horaedb_spark.operators import dedup, similarity, text
from incubator_horaedb_spark.operators.dialect import DUCK, SPARK
from incubator_horaedb_spark.querybank.registry import load, register


def _sql_query(name: str, template_fn, **kw):
    tables = kw.pop("_tables", ("documents",))
    spark_sql = template_fn(SPARK, **kw)
    duck_sql = template_fn(DUCK, **kw)

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(spark_sql)

    q.__name__ = name
    q.__doc__ = f"{template_fn.__module__}.{template_fn.__name__} — see operator docstring."
    register(name, oracle=duck_sql)(q)
    return q


# --- dedup family ---------------------------------------------------------
_sql_query("dedup_exact", dedup.exact_dedup_sql)
_sql_query("dedup_minhash_lsh", dedup.minhash_lsh_sql, threshold=0.8)
_sql_query("dedup_simhash", dedup.simhash_pairs_sql)
_sql_query("dedup_ngram_jaccard", dedup.ngram_jaccard_sql, threshold=0.8)

# --- similarity search ----------------------------------------------------
_sql_query("ann_cosine_bruteforce", similarity.ann_bruteforce_sql, _tables=("embeddings",))
_sql_query("ann_cosine_ivf", similarity.ann_ivf_sql, _tables=("embeddings",))
_sql_query(
    "embedding_near_dup_pairs",
    similarity.embedding_cosine_pairs_sql,
    threshold=0.45,
    _tables=("embeddings",),
)

# --- text analysis --------------------------------------------------------
_sql_query("text_langid", text.langid_sql)
_sql_query("text_quality", text.quality_sql)
_sql_query("text_token_count", text.token_count_sql)
_sql_query("text_fingerprint", text.fingerprint_sql)
