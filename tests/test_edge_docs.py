"""Degenerate-document edge cases for the text pipelines.

ADVICE r02: `sequence(1, size(toks)-1)` on a 1-token document evaluates
to the DESCENDING list [1, 0] on Spark (element_at(toks, 0) throws),
while DuckDB's range(1, 1) is empty — the bigram pipelines only worked
because the corpus had no such documents.  These tests pin the guarded
behavior on both engines with 1-token and empty-text documents present.
"""

from __future__ import annotations

import duckdb
import pytest

from incubator_horaedb_spark.operators import text
from incubator_horaedb_spark.operators.dialect import DUCK, SPARK

EDGE_DOCS = [
    (0, "web", "the cat sat on the mat the cat sat again"),
    (1, "web", "singleton"),          # 1 token -> zero bigrams
    (2, "books", ""),                 # empty text -> split gives ['']
    (3, "books", "a b a b a b a b a b a b"),
]


@pytest.fixture(scope="module")
def edge_tables(spark):
    df = spark.createDataFrame(EDGE_DOCS, "doc_id LONG, source STRING, text STRING")
    df.createOrReplaceTempView("edge_documents")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW edge_documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}', '{t}')" for i, s, t in EDGE_DOCS)
        + ") v(doc_id, source, text)"
    )
    yield con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_repetition_single_token_doc(spark, edge_tables):
    sql_s = text.repetition_sql(SPARK, table="edge_documents")
    sql_d = text.repetition_sql(DUCK, table="edge_documents")
    got = _rows(spark.sql(sql_s))
    want = sorted(tuple(r) for r in edge_tables.execute(sql_d).fetchall())
    assert got == want
    # doc 1 (one token) and doc 2 (empty) produce no bigrams -> absent
    ids = {r[0] for r in got}
    assert 1 not in ids and 2 not in ids and {0, 3} <= ids


def test_quality_filter_single_token_doc(spark, edge_tables):
    sql_s = text.quality_filter_sql(SPARK, table="edge_documents")
    sql_d = text.quality_filter_sql(DUCK, table="edge_documents")
    got = _rows(spark.sql(sql_s))
    want = sorted(tuple(r) for r in edge_tables.execute(sql_d).fetchall())
    assert got == want
    # every source still reports ALL its docs (bigram-less docs survive
    # the LEFT JOIN with repetitive = NULL)
    assert {(r[0], r[1]) for r in got} == {("web", 2), ("books", 2)}
