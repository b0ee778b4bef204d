"""Driver-fetch-path type safety for every registered oracle.

The grading driver fetches oracle results through pandas/Arrow, where
DuckDB types that have no exact pandas dtype degrade silently:

* HUGEINT (the default result of ``sum(BIGINT)``) -> float64 under
  ``.df()`` / decimal128(38,0) under ``.arrow()`` — so ``4950`` hashes as
  ``4950.0`` and the value-hash diverges from Spark's BIGINT while rows
  and column names still match.  This exact failure kept two queries
  driver-red for two rounds (VERDICT r03, What's wrong #1/#2).
* UINT* types round-trip asymmetrically vs Spark's signed longs.

Rule (querybank/__init__.py docstring): every final integer aggregate in
an oracle must be CAST to BIGINT.  This test enforces it mechanically by
probing each oracle's ``LIMIT 0`` Arrow schema — cheap (no data read) and
exhaustive over the whole bank, including tolerance oracles.
"""

from __future__ import annotations

import duckdb
import pytest

from incubator_horaedb_spark import querybank
from incubator_horaedb_spark.querybank.registry import TABLES

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_FORBIDDEN = ("decimal", "uint", "hugeint", "int128")


def _all_oracles() -> dict[str, str]:
    out = dict(querybank.oracles())
    for name, (sql, _vcol, _rtol) in querybank.tolerance_oracles().items():
        out[name] = sql
    return out


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_driver_unsafe_types_in_any_oracle(con):
    offenders: list[str] = []
    oracles = _all_oracles()
    assert len(oracles) > 150  # the probe must actually cover the bank
    for name, sql in oracles.items():
        schema = con.execute(f"SELECT * FROM ({sql}) __q LIMIT 0").arrow().schema
        for field in schema:
            ts = str(field.type)
            if any(bad in ts for bad in _FORBIDDEN):
                offenders.append(f"{name}.{field.name}: {ts}")
    assert not offenders, (
        "oracle final columns with pandas/Arrow-unsafe DuckDB types "
        "(CAST the aggregate to BIGINT): " + "; ".join(offenders)
    )
