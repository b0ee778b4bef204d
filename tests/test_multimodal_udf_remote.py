"""Tests: multimodal plumbing, UDF registry, Prometheus remote write/read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _media_df(spark):
    rows = [
        (1, b"abcdef", "image"),
        (2, b"x" * 100, "video"),
        (3, None, "image"),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary, media_type string")


def test_decode_media_stub(spark):
    from incubator_horaedb_spark.operators.multimodal import decode_media

    out = {r["media_id"]: r for r in decode_media(_media_df(spark)).collect()}
    assert out[1]["n_bytes"] == 6
    assert out[1]["width"] == 64 + (6 * 7919) % 1216
    assert out[2]["n_frames"] == 1 + 100 % 30
    assert out[3]["n_bytes"] is None  # NULL media → NULL meta


def test_frame_sample(spark):
    from incubator_horaedb_spark.operators.multimodal import frame_sample

    out = frame_sample(_media_df(spark), every_nth=5).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # media 2: n_frames = 11 → frames 0,5,10
    assert sorted(by_id[2]) == [0, 5, 10]
    assert 3 not in by_id  # NULL media skipped


def test_udf_registry(spark):
    import pandas as pd

    from incubator_horaedb_spark.functions.registry import FunctionRegistry

    reg = FunctionRegistry()

    @reg.register_pandas_scalar("double_it", "double")
    def double_it(v: pd.Series) -> pd.Series:
        return v * 2

    @reg.register_grouped_agg("my_span", "double")
    def my_span(v: pd.Series) -> float:
        return float(v.max() - v.min())

    with pytest.warns(UserWarning, match="row-at-a-time"):
        @reg.register_python_scalar("slow_inc", "bigint")
        def slow_inc(x):
            return x + 1

    assert reg.names() == ["double_it", "my_span", "slow_inc"]

    df = spark.createDataFrame([(1.0, "a"), (3.0, "a"), (2.0, "b")], "v double, g string")
    out = df.select(reg.get("DOUBLE_IT")("v").alias("d")).agg(F.sum("d")).first()[0]
    assert out == 12.0
    span = df.groupBy("g").agg(reg.get("my_span")("v").alias("s")).orderBy("g").collect()
    assert [r["s"] for r in span] == [2.0, 0.0]

    reg.bind_to_session(spark)
    assert spark.sql("SELECT double_it(21.0) AS x").first()["x"] == 42.0


def test_prom_remote_roundtrip(spark):
    from incubator_horaedb_spark.frontends.prom_remote import (
        parse_remote_write,
        remote_read_df,
        to_remote_read_response,
    )

    tables = parse_remote_write(
        [
            {
                "labels": {"__name__": "cpu", "host": "a", "dc": "x"},
                "samples": [(1000, 0.5), (2000, 0.6)],
            },
            {
                "labels": {"__name__": "cpu", "host": "b", "dc": "x"},
                "samples": [(1500, 0.9)],
            },
        ]
    )
    assert set(tables) == {"cpu"}
    df = spark.createDataFrame(tables["cpu"]).select(
        F.timestamp_millis("ts").alias("ts"), "value", "host", "dc"
    )
    # remote read: matchers + time range only, no alignment (remote.rs)
    out = remote_read_df(df, [("host", "=", "a")], start_ms=0, end_ms=1800)
    resp = to_remote_read_response(out)
    assert resp == [{"labels": {"host": "a", "dc": "x"}, "samples": [(1000, 0.5)]}]
    # regex matcher across series
    out2 = remote_read_df(df, [("host", "=~", "a|b")], start_ms=0, end_ms=3000)
    assert out2.count() == 3


def test_prom_remote_query_assertions(spark, tmp_path):
    # Port of integration_tests/prom/remote-query.py:75-106: equality /
    # regex / negated matchers, the __horaedb_field__ uppercase field
    # selector, and case-sensitive mixed-case table + column names —
    # through the dialect shim (write) and the remote-read plan (read).
    from incubator_horaedb_spark.frontends.prom_remote import remote_read_df
    from incubator_horaedb_spark.frontends.promql import parse_promql
    from incubator_horaedb_spark.frontends.sql_shim import Engine

    engine = Engine(spark, str(tmp_path / "store"))
    ts = 1700000000000
    for t in ("prom_remote_query_test", "PROM_REMOTE_QUERY_TEST"):
        engine.execute_sql(
            f"CREATE TABLE `{t}` (t timestamp NOT NULL, tag1 string TAG, "
            f"`TAG2` string TAG, value double, `VALUE2` double, timestamp KEY(t)) "
            "ENGINE=Analytic WITH(enable_ttl='false')"
        )
    engine.execute_sql(
        "insert into prom_remote_query_test(t, tag1, `TAG2`, value, `VALUE2`) values "
        f"({ts - 5000}, 'v1', 'v2', 1, 2), ({ts}, 'v1', 'v2', 11, 22)"
    )
    engine.execute_sql(
        "insert into `PROM_REMOTE_QUERY_TEST`(t, tag1, `TAG2`, value, `VALUE2`) values "
        f"({ts - 5000}, 'v1', 'v2', 10, 20), ({ts}, 'v1', 'v2', 110, 220)"
    )

    def pql(query):
        pq = parse_promql(query)
        sel = pq.selector
        df = engine.table(sel.metric).read()
        matchers = [(m.name, m.op, m.value) for m in sel.matchers]
        out = remote_read_df(
            df,
            matchers,
            start_ms=ts - sel.range_ms,
            end_ms=ts,
            ts_col="t",
            value_col=sel.field_name or "value",
        )
        # output layout: (*tags, ts, value)
        return sorted((r[-2].timestamp(), r[-1]) for r in out.collect())

    base = "prom_remote_query_test"
    assert pql(base + '{tag1="v1"}[5m]') == [(ts / 1000 - 5, 1.0), (ts / 1000, 11.0)]
    assert pql(base + '{TAG2="v2"}[5m]') == [(ts / 1000 - 5, 1.0), (ts / 1000, 11.0)]
    assert pql(base + '{tag1=~"v1"}[5m]') == [(ts / 1000 - 5, 1.0), (ts / 1000, 11.0)]
    assert pql(base + '{tag1!="v1"}[5m]') == []
    assert pql(base + '{tag1!~"v1"}[5m]') == []
    # uppercase field selector
    assert pql(base + '{tag1="v1",__horaedb_field__="VALUE2"}[5m]') == [
        (ts / 1000 - 5, 2.0),
        (ts / 1000, 22.0),
    ]
    # uppercase table
    assert pql('PROM_REMOTE_QUERY_TEST{tag1="v1"}[5m]') == [
        (ts / 1000 - 5, 10.0),
        (ts / 1000, 110.0),
    ]


def test_audio_spectral_features_kernel(spark):
    """Spectral feature extraction over REAL decoded PCM: numpy rfft per
    analysis window inside the same mapInPandas shape as the PCM stats —
    verifying the dominant-bin result against a plain-numpy model.  (No
    SQL oracle: the DFT is not expressible in the dual-dialect templates;
    the numpy model is the independent check.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from incubator_horaedb_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_payload,
        synthesize_payloads,
    )

    SPEC_SCHEMA = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("window_idx", T.LongType(), False),
            T.StructField("dom_bin", T.LongType(), True),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(b)
                channels, _rate, n = parse_wav_header(raw)
                off = raw.rfind(b"data") + 8
                pcm = np.frombuffer(raw, dtype="<i2", count=n * channels, offset=off)
                ch0 = pcm.reshape(-1, channels)[:, 0].astype(np.float64)
                k = 0
                while k * 160 < n:
                    seg = ch0[k * 160 : k * 160 + 400]
                    if len(seg) >= 8:
                        spec = np.abs(np.fft.rfft(seg))
                        rows.append((int(mid), k, int(spec[1:].argmax() + 1)))
                    k += 1
            yield pd.DataFrame(rows, columns=["media_id", "window_idx", "dom_bin"])

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = synthesize_payloads(docs, synth_wav_payload)
    got = {
        (r["media_id"], r["window_idx"]): r["dom_bin"]
        for r in media.mapInPandas(kernel, schema=SPEC_SCHEMA).collect()
    }
    assert got, "no spectral windows computed"
    # independent model for one media id
    mid = 3
    raw = synth_wav_payload(mid)
    channels, _rate, n = parse_wav_header(raw)
    off = raw.rfind(b"data") + 8
    ch0 = (
        np.frombuffer(raw, dtype="<i2", count=n * channels, offset=off)
        .reshape(-1, channels)[:, 0]
        .astype(np.float64)
    )
    seg = ch0[:400]
    expect = int(np.abs(np.fft.rfft(seg))[1:].argmax() + 1)
    assert got[(mid, 0)] == expect
