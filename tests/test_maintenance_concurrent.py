"""Maintenance-vs-live-reader race gates (VERDICT r09 next-round #5):
a reader collecting the DEDUP view while ``compact()`` rewrites segments
— and while ``ttl_expire()`` drops them — must never see torn, duplicate,
stale-version, or partially-present keys.

The rename-aside commit's documented visibility contract
(table.py _commit_rewrite): a racing reader's listing sees the old
segment, the new segment, or — for the one-metadata-op window between
the two renames — the segment ABSENT as a whole; never a merge of old
and new files and never a torn file.  A scan that planned over
pre-rewrite files and executed after the swap fails LOUDLY
(FILE_NOT_EXIST), which is a retryable conflict, not a wrong answer.

So the dedup-view invariants under concurrent compaction are:

* no duplicate primary key in any successful read,
* every returned value is the key's LATEST version (compaction only
  collapses superseded versions — it must never resurrect an old one),
* missing keys, if any, are exactly the key-set of at most ONE segment
  (the absent window is whole-segment and compact rewrites one segment
  at a time),
* any read error is the documented loud conflict, nothing else.

Reference analogue: sequence-snapshot reads under compaction
(src/analytic_engine/src/instance/read.rs + compaction picker); there a
manifest pointer pins visibility, here the invariant set above IS the
contract directory-granular storage can give (catalog.py documents the
boundary).
"""

from __future__ import annotations

import threading

import pytest
from incubator_horaedb_spark.frontends.sql_shim import Engine

SEG_MS = 2 * 3600 * 1000
N_SEG = 3
KEYS_PER_SEG = 8
N_VERSIONS = 3


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "store"))


def _mk_overwrite_table(engine, name: str):
    """OVERWRITE table: every key gets N_VERSIONS versions (same tag+ts,
    increasing __seq); value encodes (version, segment, i) so a stale or
    torn read is detectable from the value alone."""
    engine.execute_sql(
        f"CREATE TABLE {name} (k string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic "
        "WITH(enable_ttl='false', update_mode='OVERWRITE', segment_duration='2h')"
    )
    for version in range(1, N_VERSIONS + 1):
        for s in range(N_SEG):
            values = ", ".join(
                f"('s{s}k{i}', {version * 10000 + s * 100 + i}, "
                f"{s * SEG_MS + 1000 + i})"
                for i in range(KEYS_PER_SEG)
            )
            engine.execute_sql(f"INSERT INTO {name} (k, v, t) VALUES {values}")
    return engine.table(name)


def _latest() -> dict[str, float]:
    return {
        f"s{s}k{i}": float(N_VERSIONS * 10000 + s * 100 + i)
        for s in range(N_SEG)
        for i in range(KEYS_PER_SEG)
    }


def _seg_of(key: str) -> int:
    return int(key[1 : key.index("k")])


def test_dedup_reader_racing_compaction(engine):
    tbl = _mk_overwrite_table(engine, "mcc1")
    expected = _latest()
    all_keys = set(expected)
    stop = threading.Event()
    reads: list[int] = []
    errors: list[str] = []
    conflicts = 0

    def reader() -> None:
        nonlocal conflicts
        while not stop.is_set():
            try:
                rows = tbl.read().select("k", "v").collect()
            except Exception as e:  # noqa: BLE001 — collected for assertion
                msg = str(e)
                if "FILE_NOT_EXIST" in msg or "FileNotFound" in msg:
                    conflicts += 1  # documented loud conflict
                    continue
                errors.append(f"unexpected error: {msg[:300]}")
                continue
            seen: dict[str, float] = {}
            for r in rows:
                if r.k in seen:
                    errors.append(f"duplicate key {r.k}")
                if expected.get(r.k) != r.v:
                    errors.append(
                        f"stale/torn value for {r.k}: {r.v} != {expected.get(r.k)}"
                    )
                seen[r.k] = r.v
            missing = all_keys - set(seen)
            if missing and {_seg_of(k) for k in missing} != {
                _seg_of(next(iter(missing)))
            }:
                errors.append(f"keys missing across >1 segment: {sorted(missing)}")
            elif missing and not all(
                k in missing
                for k in all_keys
                if _seg_of(k) == _seg_of(next(iter(missing)))
            ):
                errors.append(f"partial segment visible: {sorted(missing)}")
            reads.append(len(seen))

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(3):
            assert tbl.compact() == N_SEG
    finally:
        stop.set()
        t.join()
    assert not errors, errors[:5]
    assert reads, "reader never completed a collect"
    # post-compaction end state: exactly the latest version of every key
    final = {r.k: r.v for r in tbl.read().select("k", "v").collect()}
    assert final == expected


def test_dedup_reader_racing_ttl_expire(engine, spark):
    """ttl_expire drops WHOLE expired segments; a racing dedup reader
    must only ever see (full table) or (full table minus whole expired
    segments) — never torn keys or wrong values."""
    name = "mcc2"
    engine.execute_sql(
        f"CREATE TABLE {name} (k string TAG, v double, t timestamp NOT NULL, "
        "timestamp KEY (t)) ENGINE=Analytic "
        "WITH(enable_ttl='true', ttl='1h', update_mode='OVERWRITE', "
        "segment_duration='2h')"
    )
    import time as _time

    now_ms = int(_time.time() * 1000)
    seg_now = now_ms // SEG_MS
    # two long-expired segments + fresh rows written AT now (the read
    # path also row-filters by TTL with wall-clock now, so only the
    # fresh rows are ever visible — ttl_expire's job is reclaiming the
    # expired DIRECTORIES underneath the racing reader)
    for s, seg in enumerate((seg_now - 6, seg_now - 5)):
        values = ", ".join(
            f"('s{s}k{i}', {s * 100 + i}, {seg * SEG_MS + 1000 + i})"
            for i in range(KEYS_PER_SEG)
        )
        engine.execute_sql(f"INSERT INTO {name} (k, v, t) VALUES {values}")
    values = ", ".join(
        f"('s2k{i}', {200 + i}, {now_ms - 60_000 + i})" for i in range(KEYS_PER_SEG)
    )
    engine.execute_sql(f"INSERT INTO {name} (k, v, t) VALUES {values}")
    tbl = engine.table(name)
    live_keys = {f"s2k{i}" for i in range(KEYS_PER_SEG)}
    stop = threading.Event()
    errors: list[str] = []
    reads: list[int] = []

    def reader() -> None:
        while not stop.is_set():
            try:
                rows = tbl.read().select("k", "v").collect()
            except Exception as e:  # noqa: BLE001 — collected for assertion
                msg = str(e)
                if "FILE_NOT_EXIST" in msg or "FileNotFound" in msg:
                    continue
                errors.append(f"unexpected error: {msg[:300]}")
                continue
            keys = {r.k for r in rows}
            if len(keys) != len(rows):
                errors.append("duplicate keys in dedup view during TTL purge")
            if keys != live_keys:
                errors.append(f"torn TTL visibility: {sorted(keys)[:6]}...")
            for r in rows:
                s = _seg_of(r.k)
                i = int(r.k[r.k.index("k") + 1 :])
                if r.v != float(s * 100 + i):
                    errors.append(f"corrupt value {r.k}={r.v}")
            reads.append(len(keys))

    t = threading.Thread(target=reader)
    t.start()
    try:
        dropped = tbl.ttl_expire()
    finally:
        stop.set()
        t.join()
    assert dropped == 2
    assert not errors, errors[:5]
    assert reads
    assert {r.k for r in tbl.read().select("k").collect()} == live_keys
