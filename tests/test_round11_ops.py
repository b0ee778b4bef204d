"""Round-11 feature semantics at golden scale: snapshot-across-compaction
retention and the InfluxQL transform pipeline's shared-frame contract are
oracle-gated at every tier; these tests pin the SEMANTICS on hand-checked
fixtures so a regression is localized (the gate only says "hash differs").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_horaedb_spark.frontends.sql_shim import Engine
from incubator_horaedb_spark.table import Table


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "store"))


def _mk(engine, name="snapdemo"):
    engine.execute_sql(
        f"CREATE TABLE {name} (k string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic "
        "WITH(enable_ttl='false', update_mode='OVERWRITE')"
    )
    return Table(engine.spark, engine.catalog, name)


def test_snapshot_survives_only_uncompacted_versions(engine):
    """The documented LSM retention contract (table.py Table.read,
    instance/read.rs analogue): BEFORE compaction a snapshot reconstructs
    the exact state at its sequence; AFTER compaction reclaims superseded
    versions, the same snapshot sees only the versions that survived."""
    tbl = _mk(engine)
    engine.execute_sql(
        "INSERT INTO snapdemo (k, v, t) VALUES "
        "('a', 1.0, 1000), ('b', 2.0, 2000), ('c', 3.0, 3000)"
    )
    snap = tbl.last_seq()
    # update a and b (same tag+ts => same pk), leave c untouched
    engine.execute_sql(
        "INSERT INTO snapdemo (k, v, t) VALUES ('a', 10.0, 1000), ('b', 20.0, 2000)"
    )

    def state(df):
        return {(r["k"], r["v"]) for r in df.select("k", "v").collect()}

    # pre-compaction: the snapshot is the exact pass-1 state
    assert state(tbl.read(as_of_seq=snap)) == {("a", 1.0), ("b", 2.0), ("c", 3.0)}
    assert state(tbl.read()) == {("a", 10.0), ("b", 20.0), ("c", 3.0)}

    tbl.compact()

    # post-compaction: superseded pass-1 versions of a/b are reclaimed, so
    # the snapshot shows only the SURVIVING pass-1 version (c); the
    # current read is untouched by compaction
    assert state(tbl.read(as_of_seq=snap)) == {("c", 3.0)}
    assert state(tbl.read()) == {("a", 10.0), ("b", 20.0), ("c", 3.0)}
    # a snapshot at the post-update head equals the current state
    assert state(tbl.read(as_of_seq=tbl.last_seq())) == state(tbl.read())


def test_pg_sql_literal_timestamp_digits_inline():
    """Digit-only timestamp parameters inline as epoch-ms numerics (the
    binary-param decode path feeds this form); ISO strings keep quoting;
    injection attempts in the ISO path stay quoted."""
    from incubator_horaedb_spark.wire.postgresql import OID_TIMESTAMP, _sql_literal

    assert _sql_literal("1691116127623", OID_TIMESTAMP) == "1691116127623"
    assert _sql_literal("-5", OID_TIMESTAMP) == "-5"
    assert (
        _sql_literal("2024-01-01 00:00:00", OID_TIMESTAMP)
        == "'2024-01-01 00:00:00'"
    )
    assert _sql_literal("1' OR 1=1 --", OID_TIMESTAMP) == "'1'' OR 1=1 --'"


def test_mysql_binary_datetime_ms_decode():
    import struct

    from incubator_horaedb_spark.wire.mysql import _binary_datetime_ms

    # 2023-08-04 02:28:47.623 UTC = 1691116127623 ms
    raw11 = struct.pack("<HBB", 2023, 8, 4) + bytes([2, 28, 47]) + struct.pack(
        "<I", 623_000
    )
    assert _binary_datetime_ms(raw11) == 1691116127623
    raw7 = struct.pack("<HBB", 2023, 8, 4) + bytes([2, 28, 47])
    assert _binary_datetime_ms(raw7) == 1691116127000
    raw4 = struct.pack("<HBB", 2023, 8, 4)
    assert _binary_datetime_ms(raw4) == 1691107200000  # midnight
    with pytest.raises(ValueError):
        _binary_datetime_ms(struct.pack("<HBB", 2023, 13, 4) + bytes([0, 0, 0]))


def test_hist_quantile_rollup_mergeability(spark):
    # hour-level histogram partials merged to day must give the SAME
    # quantiles as binning the raw day directly — the mergeability
    # property that lets the ladder answer day/week/month by count-sum
    import datetime

    import numpy as np

    from incubator_horaedb_spark.querybank.timeseries import _HIST_QUANTILE_SQL

    rng = np.random.default_rng(7)
    rows = [
        (
            "t",
            datetime.datetime(2024, 1, 1 + int(i % 2), int(i % 24)),
            float(v),
        )
        for i, v in enumerate(rng.uniform(0, 700, 500))
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    df.createOrReplaceTempView("events")
    got = {
        (r["event_type"], r["bucket_day"]): (r["n"], r["p50_ub"], r["p95_ub"], r["p99_ub"])
        for r in spark.sql(_HIST_QUANTILE_SQL).collect()
    }
    # direct single-pass reference: bin the raw rows per day, same CDF rule
    import collections
    import math

    byday = collections.defaultdict(list)
    for _t, ts, v in rows:
        byday[ts.date()].append(min(127, max(0, math.floor(v / 8.0))))
    for day, bins in byday.items():
        n = len(bins)
        bins.sort()
        expect = []
        for q in (0.50, 0.95, 0.99):
            k = math.ceil(q * n)
            expect.append((bins[k - 1] + 1) * 8.0)
        assert got[("t", day)] == (n, *expect), day
