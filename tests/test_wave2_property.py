"""Property tests for the second-wave operators: the dual-dialect SQL
templates (rendered to DuckDB for speed — the Spark rendering is
hash-gated against the same template by the correctness harness) vs
independent pure-Python models on random inputs.  Agreement on random
data is evidence the templates implement the intended semantics, not
just the gated corpus shapes."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incubator_horaedb_spark.operators.dialect import DUCK, P
from incubator_horaedb_spark.operators.text import (
    _CMS_A,
    _CMS_B,
    _CMS_W,
    cms_heavy_hitters_sql,
)
from incubator_horaedb_spark.querybank.timeseries import _funnel_sql, _retention_sql

from incubator_horaedb_spark.functions.timeutil import epoch_ms

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


# ---------------------------------------------------------------- funnel --

_user = st.integers(min_value=0, max_value=5)
_type = st.sampled_from(["view", "click", "purchase", "error"])
_ms = st.integers(min_value=0, max_value=10_000)
_events = st.lists(st.tuples(_user, _type, _ms), min_size=1, max_size=40)


def _funnel_model(events):
    """Ordered-funnel reference: per user, earliest view, then earliest
    later click, then earliest later purchase."""
    by_user: dict = {}
    for u, t, ms in events:
        by_user.setdefault(u, []).append((t, ms))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        t1 = min((ms for t, ms in evs if t == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min((ms for t, ms in evs if t == "click" and ms > t1), default=None)
        if t2 is None:
            continue
        n2 += 1
        t3 = min((ms for t, ms in evs if t == "purchase" and ms > t2), default=None)
        if t3 is not None:
            n3 += 1
    return n1, n2, n3


@settings(**_SETTINGS)
@given(events=_events)
def test_funnel_matches_model(duck, events):
    duck.execute("DROP TABLE IF EXISTS events")
    duck.execute("CREATE TABLE events (user_id bigint, event_type varchar, ts timestamp)")
    duck.executemany(
        "INSERT INTO events VALUES (?, ?, make_timestamp(CAST(? AS BIGINT) * 1000))",
        [(u, t, ms) for u, t, ms in events],
    )
    got = duck.execute(_funnel_sql("duckdb")).fetchone()
    assert tuple(got) == _funnel_model(events)


# ------------------------------------------------------------- retention --


def _retention_model(events):
    active = {(u, ms // 86_400_000) for u, _t, ms in events}
    cohort = {}
    for u, d in active:
        cohort[u] = min(cohort.get(u, d), d)
    out: dict = {}
    for u, d in active:
        off = d - cohort[u]
        if off <= 7:
            key = (cohort[u], off)
            out[key] = out.get(key, 0) + 1
    return out


_ms_wide = st.integers(min_value=0, max_value=86_400_000 * 12)
_events_wide = st.lists(st.tuples(_user, _type, _ms_wide), min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(events=_events_wide)
def test_retention_matches_model(duck, events):
    duck.execute("DROP TABLE IF EXISTS events")
    duck.execute("CREATE TABLE events (user_id bigint, event_type varchar, ts timestamp)")
    duck.executemany(
        "INSERT INTO events VALUES (?, ?, make_timestamp(CAST(? AS BIGINT) * 1000))",
        [(u, t, ms) for u, t, ms in events],
    )
    got = {
        (c, o): n for c, o, n in duck.execute(_retention_sql("duckdb")).fetchall()
    }
    assert got == _retention_model(events)


# ------------------------------------------------------------------- CMS --


def _char_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 131 + ord(ch)) % P
    return acc


def _cms_model(docs, k=20):
    """Pure-Python count-min sketch with the template's hash family."""
    freq: dict = {}
    for text in docs:
        for tok in text.split(" "):
            h = _char_hash(tok)
            freq[h] = freq.get(h, 0) + 1
    cells: dict = {}
    for h, cnt in freq.items():
        for j in range(4):
            pos = (h * _CMS_A[j] + _CMS_B[j]) % P % _CMS_W
            cells[(j, pos)] = cells.get((j, pos), 0) + cnt
    est = {
        h: min(cells[(j, (h * _CMS_A[j] + _CMS_B[j]) % P % _CMS_W)] for j in range(4))
        for h in freq
    }
    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(h, freq[h], e) for h, e in ranked]


_token = st.text(alphabet="abcd", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=1, max_size=10).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=8)


@settings(**_SETTINGS)
@given(docs=_docs)
def test_cms_matches_model(duck, docs):
    duck.execute("DROP TABLE IF EXISTS documents")
    duck.execute("CREATE TABLE documents (doc_id bigint, text varchar)")
    duck.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(docs))
    )
    got = duck.execute(cms_heavy_hitters_sql(DUCK)).fetchall()
    assert [tuple(r) for r in got] == _cms_model(docs)


# ----------------------------------------------------------- holt_winters --


def _hw_model(samples, sf=0.5, tf=0.25):
    """Prometheus holtWinters reference loop (float64)."""
    v = [x for _, x in sorted(samples)]
    s0 = v[0]
    b = v[1] - v[0]
    s1 = s0
    for i in range(1, len(v)):
        x = sf * v[i]
        y = (1 - sf) * (s0 + b)
        s1 = x + y
        b = tf * (s1 - s0) + (1 - tf) * b
        s0 = s1
    return s1


_samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),
        st.integers(min_value=-1000, max_value=1000).map(lambda q: q / 16.0),
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda kv: kv[0],
)


@settings(**_SETTINGS)
@given(samples=_samples)
def test_holt_winters_matches_model(duck, samples):
    """The recursive-CTE evaluator vs the plain-Python Prometheus loop.
    Values are dyadic (q/16) so the quantization step in the template is
    the identity and the recurrence arithmetic is exactly comparable."""
    from incubator_horaedb_spark.querybank.timeseries import _hw_sql

    duck.execute("DROP TABLE IF EXISTS events")
    duck.execute(
        "CREATE TABLE events (event_id bigint, ts timestamp, value double)"
    )
    duck.execute("ALTER TABLE events ADD COLUMN event_type varchar DEFAULT 'a'")
    # all samples inside ONE 6h bucket; okey = epoch_ms * 2^20 + event_id
    duck.executemany(
        "INSERT INTO events (event_id, ts, value, event_type) "
        "VALUES (?, make_timestamp(CAST(? AS BIGINT) * 1000), ?, 'a')",
        [(i, k * 1000, v) for i, (k, v) in enumerate(samples)],
    )
    rows = duck.execute(_hw_sql("duckdb")).fetchall()
    assert len(rows) == 1
    _etype, _ts, n, smoothed = rows[0]
    assert n == len(samples)
    import math

    expect = _hw_model([(k * 1000, v) for k, v in samples])
    expect_r6 = math.floor(expect * 1e6 + 0.5) / 1e6
    assert abs(smoothed - expect_r6) < 1e-9, (smoothed, expect_r6)


# -------------------------------------------------------------- LTTB ------


def _lttb_model(events, stride=15 * 60 * 1000):
    """Pure-Python rendering of the parallel centroid-anchored LTTB."""
    import math

    pts = sorted(
        ((ems, v, (ems << 20) + eid) for eid, ems, v in events), key=lambda p: p[2]
    )
    vq = lambda v: math.floor(v * 1024 + 0.5) / 1024
    byb: dict = {}
    for ems, v, okey in pts:
        byb.setdefault(ems // stride, []).append((ems, vq(v), okey))
    bs = sorted(byb)
    cent = {
        b: (
            sum(e for e, _v, _o in byb[b]) / len(byb[b]),
            sum(v for _e, v, _o in byb[b]) / len(byb[b]),
        )
        for b in bs
    }
    out = {}
    for idx, b in enumerate(bs):
        prev_c = cent[bs[idx - 1]] if idx > 0 else None
        next_c = cent[bs[idx + 1]] if idx + 1 < len(bs) else None
        rows = byb[b]
        if prev_c is None:
            pick = min(rows, key=lambda r: r[2])
        elif next_c is None:
            pick = max(rows, key=lambda r: r[2])
        else:
            ax, ay = prev_c
            cx, cy = next_c

            def key(r):
                ems, vy, okey = r
                area = abs((ax - cx) * (vy - ay) - (ax - ems) * (cy - ay))
                return (-math.floor(area * 1048576.0 + 0.5), okey)

            pick = min(rows, key=key)
        out[b] = (pick[0], pick[1])
    return out


_lttb_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # event_id
        st.integers(min_value=0, max_value=4 * 15 * 60 * 1000),  # ems in 4 buckets
        st.integers(min_value=-320, max_value=320).map(lambda q: q / 16.0),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@settings(**_SETTINGS)
@given(events=_lttb_events)
def test_lttb_matches_model(duck, events):
    from incubator_horaedb_spark.querybank.timeseries import _lttb_sql

    duck.execute("DROP TABLE IF EXISTS events")
    duck.execute(
        "CREATE TABLE events (event_id bigint, event_type varchar, ts timestamp, value double)"
    )
    duck.executemany(
        "INSERT INTO events VALUES (?, 'a', make_timestamp(CAST(? AS BIGINT) * 1000), ?)",
        events,
    )
    got = {}
    for _etype, _bts, ts, value in duck.execute(
        _lttb_sql("duckdb") + " ORDER BY bucket_ts"
    ).fetchall():
        ems = epoch_ms(ts)
        got[ems // (15 * 60 * 1000)] = (ems, math_floor_q(value))
    want = {
        b: (ems, math_floor_q(v)) for b, (ems, v) in _lttb_model(events).items()
    }
    assert got == want


def math_floor_q(v):
    import math

    return math.floor(v * 1024 + 0.5) / 1024


# --------------------------------------------------- gapfill interpolate --


def _interp_model(events):
    """Pure-Python gapfill-with-linear-interpolation reference."""
    import math

    START, END, BUCKET = 1704067200000, 1704153600000, 600_000
    n = (END - START) // BUCKET
    q20 = 1 << 20
    byk: dict = {}
    for ems, v in events:
        if START <= ems < END:
            byk.setdefault((ems - START) // BUCKET, []).append(
                math.floor(v * q20 + 0.5) / q20
            )
    avg = {
        k: math.floor((sum(vs) / len(vs)) * 1e6 + 0.5) / 1e6 for k, vs in byk.items()
    }
    out = {}
    for k in range(n):
        if k in avg:
            out[k] = (avg[k], False)
            continue
        prevs = [kk for kk in avg if kk < k]
        nexts = [kk for kk in avg if kk > k]
        if not prevs or not nexts:
            out[k] = (None, True)
            continue
        pk, nk = max(prevs), min(nexts)
        pv, nv = avg[pk], avg[nk]
        val = pv + (nv - pv) * ((k - pk) / (nk - pk))
        out[k] = (math.floor(val * 1e6 + 0.5) / 1e6, True)
    return out


_interp_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=143).map(
            lambda b: 1704067200000 + b * 600_000 + 1000
        ),
        st.integers(min_value=-320, max_value=320).map(lambda q: q / 16.0),
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(events=_interp_events)
def test_gapfill_interp_matches_model(duck, events):
    from incubator_horaedb_spark.querybank.timeseries import _gapfill_interp_sql

    duck.execute("DROP TABLE IF EXISTS events")
    duck.execute("CREATE TABLE events (event_type varchar, ts timestamp, value double)")
    duck.executemany(
        "INSERT INTO events VALUES ('a', make_timestamp(CAST(? AS BIGINT) * 1000), ?)",
        events,
    )
    got = {}
    for _etype, bts, value, gap in duck.execute(_gapfill_interp_sql("duckdb")).fetchall():
        k = (epoch_ms(bts) - 1704067200000) // 600_000
        got[k] = (value, gap)
    want = _interp_model(events)
    assert got == want
