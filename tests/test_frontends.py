"""Frontend tests: InfluxQL parse/plan, line protocol, OpenTSDB put/query."""

from __future__ import annotations

from incubator_horaedb_spark.frontends.influxql import (
    influxql_to_df,
    parse_influxql,
    parse_line_protocol,
)
from incubator_horaedb_spark.frontends.opentsdb import parse_put, parse_query_request

from incubator_horaedb_spark.functions.timeutil import epoch_ms


def test_parse_influxql():
    q = parse_influxql(
        "SELECT mean(value), count(value) FROM events "
        "WHERE time >= '2024-01-05 00:00:00' AND event_type = 'click' "
        "GROUP BY time(6h), event_type ORDER BY time DESC LIMIT 10"
    )
    assert q.projections == [("mean", "value"), ("count", "value")]
    assert q.measurement == "events"
    assert q.group_time_ms == 6 * 3_600_000
    assert q.group_tags == ["event_type"]
    assert q.order_desc and q.limit == 10


def test_influxql_plan(spark, sf_dir):
    # ts is TIMESTAMP(NANOS) in testdata parquet — must go through the
    # registry loader, which reads nanos-as-long and converts exactly.
    from incubator_horaedb_spark.querybank.registry import load

    ev = load(spark, sf_dir, "events")
    df = influxql_to_df(
        "SELECT mean(value) FROM events WHERE event_type = 'click' GROUP BY time(1d)",
        {"events": ev},
    )
    rows = df.collect()
    assert rows and set(df.columns) == {"time", "mean_value"}


def test_line_protocol():
    rows = parse_line_protocol(
        'cpu,host=web01,region=us usage=0.5,idle=99i 1700000000000000000\n'
        'cpu,host=web02 usage=0.7 1700000001000000000\n'
        'mem,host=web01 used="high" 1700000002000000000\n'
    )
    assert set(rows) == {"cpu", "mem"}
    assert rows["cpu"][0] == {
        "host": "web01",
        "region": "us",
        "usage": 0.5,
        "idle": 99,
        "ts": 1700000000000,
    }
    assert rows["mem"][0]["used"] == "high"


def test_opentsdb_put_and_query():
    put = parse_put(
        '[{"metric": "sys.cpu", "timestamp": 1700000000, "value": 1.5, '
        '"tags": {"host": "a"}}]'
    )
    assert put["sys.cpu"][0] == {"ts": 1700000000000, "value": 1.5, "host": "a"}

    req = parse_query_request(
        {
            "start": 0,
            "end": 10,
            "queries": [
                {
                    "metric": "sys.cpu",
                    "aggregator": "avg",
                    "downsample": "15m-avg",
                    "filters": [
                        {"type": "literal_or", "tagk": "host", "filter": "a|b", "groupBy": True}
                    ],
                }
            ],
        }
    )
    sub = req.queries[0]
    assert sub.downsample_ms == 900_000
    assert sub.group_by_tags == ["host"]


def test_show_measurements(spark, sf_dir):
    # InfluxQL SHOW MEASUREMENTS (influxql/planner.rs: SHOW MEASUREMENTS
    # supported) — measurement list = registered tables, sorted.
    from incubator_horaedb_spark.frontends.influxql import show_measurements
    from incubator_horaedb_spark.querybank.registry import load

    tables = {
        "events": load(spark, sf_dir, "events"),
        "cpu": load(spark, sf_dir, "events"),
    }
    assert show_measurements(tables) == ["cpu", "events"]


def test_influxql_fill_grid_golden(spark):
    # Golden port of influxql/basic.sql group-by-time cases: the bucket grid
    # spans data-min bucket → WHERE upper bound; missing buckets are NULL
    # without fill, the constant with fill(666); `ms`-suffixed epoch time
    # literals parse (basic.result golden values).
    rows = [
        (1439827200000, "between 6 and 9 feet", "coyote_creek", 8.12),
        (1439827200000, "below 3 feet", "santa_monica", 2.064),
        (1439827560000, "between 6 and 9 feet", "coyote_creek", 8.005),
        (1439827560000, "below 3 feet", "santa_monica", 2.116),
        (1439827620000, "between 6 and 9 feet", "coyote_creek", 7.887),
        (1439827620000, "below 3 feet", "santa_monica", 2.028),
    ]
    from pyspark.sql import functions as F

    h2o = spark.createDataFrame(
        rows, "ms long, level_description string, location string, water_level double"
    ).withColumn("ts", F.timestamp_millis("ms"))

    def run(q):
        df = influxql_to_df(q, {"h2o_feet": h2o})
        return [
            (epoch_ms(r["time"]), r["location"], r["count_water_level"])
            for r in df.collect()
        ]

    golden_null = [
        (1439827200000, "coyote_creek", 1),
        (1439827500000, "coyote_creek", 2),
        (1439827800000, "coyote_creek", None),
        (1439828100000, "coyote_creek", None),
        (1439827200000, "santa_monica", 1),
        (1439827500000, "santa_monica", 2),
        (1439827800000, "santa_monica", None),
        (1439828100000, "santa_monica", None),
    ]
    got = run(
        "SELECT count(water_level) FROM h2o_feet where time < 1439828400000ms "
        "group by location, time(5m)"
    )
    assert got == golden_null

    got = run(
        "SELECT count(water_level) FROM h2o_feet where time < 1439828400000ms "
        "group by location, time(5m) fill(666)"
    )
    golden_fill = [(t, loc, 666 if c is None else c) for t, loc, c in golden_null]
    assert got == golden_fill

    # fill(none) suppresses the grid: only buckets with data
    got = run(
        "SELECT count(water_level) FROM h2o_feet where time < 1439828400000ms "
        "group by location, time(5m) fill(none)"
    )
    assert got == [r for r in golden_null if r[2] is not None]

    # fill(previous) carries the last seen value forward
    got = run(
        "SELECT count(water_level) FROM h2o_feet where time < 1439828400000ms "
        "group by location, time(5m) fill(previous)"
    )
    assert got == [(t, loc, 2 if c is None else c) for t, loc, c in golden_null]


def test_opentsdb_basic_golden(spark):
    # Golden port of env/local/opentsdb/basic.sql: aggregator "none"
    # returns raw time-ordered samples; the legacy "tags" map filters
    # exactly; aggregator "sum" (no downsample) sums ACROSS SERIES PER
    # TIMESTAMP (basic.result dps: 1439827200000 → 8.12+2.064 = 10.184).
    from pyspark.sql import functions as F

    from incubator_horaedb_spark.frontends.opentsdb import query_to_dfs

    rows = [
        (1439827200000, "between 6 and 9 feet", "coyote_creek", 8.12),
        (1439827200000, "below 3 feet", "santa_monica", 2.064),
        (1439827560000, "between 6 and 9 feet", "coyote_creek", 8.005),
        (1439827560000, "below 3 feet", "santa_monica", 2.116),
        (1439827620000, "between 6 and 9 feet", "coyote_creek", 7.887),
        (1439827620000, "below 3 feet", "santa_monica", 2.028),
    ]
    t = spark.createDataFrame(
        rows, "ms long, level_description string, location string, value double"
    ).withColumn("ts", F.timestamp_millis("ms"))

    def run(q):
        (df,) = query_to_dfs(t, {"start": 1439827200000, "end": 1439827620000, "queries": [q]})
        return df

    assert run({"aggregator": "none", "metric": "t", "tags": {}}).count() == 6

    tagged = run(
        {"aggregator": "none", "metric": "t", "tags": {"location": "coyote_creek"}}
    ).collect()
    assert [r["value"] for r in tagged] == [8.12, 8.005, 7.887]

    summed = run({"aggregator": "sum", "metric": "t", "tags": {}}).collect()
    dps = {epoch_ms(r["ts"]): round(r["value"], 6) for r in summed}
    assert dps == {1439827200000: 10.184, 1439827560000: 10.121, 1439827620000: 9.915}


def test_influxql_selector_and_derivative_parse():
    from incubator_horaedb_spark.frontends.influxql import parse_influxql

    iq = parse_influxql(
        "SELECT first(value), last(value), spread(value) FROM events "
        "GROUP BY time(30m), event_type fill(none)"
    )
    assert [a for a, _ in iq.projections] == ["first", "last", "spread"]
    assert iq.group_time_ms == 1800000 and iq.derivative is None

    iq = parse_influxql(
        "SELECT derivative(mean(value), 1s) FROM events GROUP BY time(6h), event_type"
    )
    # the comma inside derivative() is not a projection separator
    assert len(iq.projections) == 1
    assert iq.derivative == ("mean", "value", 1000)


def test_line_protocol_tag_escape_roundtrip():
    # protocol_e2e renders raw JSON props (spaces, braces) as tag values;
    # its escaping must round-trip through the server's parser
    from incubator_horaedb_spark.frontends.influxql import parse_line_protocol_typed
    from incubator_horaedb_spark.querybank.protocol_e2e import _esc_tag

    nasty = ['{"k": 69}', "a,b=c d", "back\\slash", "eq=eq", "  lead"]
    lines = "\n".join(
        f"m,props={_esc_tag(v)},event_id={i} value=1.5 1700000000000000000"
        for i, v in enumerate(nasty)
    )
    batches = parse_line_protocol_typed(lines)
    got = [r["props"] for r in batches["m"].rows]
    assert got == nasty
    assert batches["m"].tag_keys == {"props", "event_id"}


def test_influxql_nonneg_derivative_and_moving_average_parse():
    q = parse_influxql(
        "SELECT non_negative_derivative(mean(v), 1s) FROM m GROUP BY time(6h), tag"
    )
    assert q.derivative == ("mean", "v", 1000)
    assert q.derivative_nonneg
    q2 = parse_influxql("SELECT moving_average(sum(v), 4) FROM m GROUP BY time(1h), tag")
    assert q2.moving_average == ("sum", "v", 4)
    assert not q2.derivative_nonneg and q2.derivative is None


def test_influxql_moving_average_semantics(spark):
    # golden: per-series rolling mean of the last 3 buckets, emitted only
    # from the 3rd bucket on (InfluxDB starts at the Nth value)
    import datetime

    rows = [
        ("a", datetime.datetime(2024, 1, 1, h), float(v))
        for h, v in [(0, 1.0), (1, 2.0), (2, 3.0), (3, 10.0)]
    ]
    df = spark.createDataFrame(rows, ["tag", "ts", "v"])
    out = influxql_to_df(
        "SELECT moving_average(sum(v), 3) FROM m GROUP BY time(1h), tag fill(none)",
        {"m": df},
    )
    got = [(r["time"].hour, r["moving_average_v"]) for r in out.collect()]
    assert got == [(2, 2.0), (3, 5.0)]


def test_influxql_nonneg_derivative_drops_negative_rows(spark):
    import datetime

    rows = [
        ("a", datetime.datetime(2024, 1, 1, h), float(v))
        for h, v in [(0, 1.0), (1, 5.0), (2, 2.0), (3, 8.0)]
    ]
    df = spark.createDataFrame(rows, ["tag", "ts", "v"])
    out = influxql_to_df(
        "SELECT non_negative_derivative(sum(v), 1h) FROM m GROUP BY time(1h), tag fill(none)",
        {"m": df},
    )
    got = [(r["time"].hour, r["non_negative_derivative_v"]) for r in out.collect()]
    # hour1: +4, hour2: -3 (dropped), hour3: +6
    assert got == [(1, 4.0), (3, 6.0)]
