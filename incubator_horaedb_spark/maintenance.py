"""Catalog-wide maintenance sweep — the engine's background jobs.

The reference runs compaction on a scheduler
(src/analytic_engine/src/compaction/scheduler.rs:1-822: periodic picker →
rewrite) and enforces TTL per table.  The Spark rendering is a batch
maintenance job — run it from cron / an orchestrator (or a Structured
Streaming trigger loop): sweep every table, rewrite small files per time
partition (compact) and drop expired segments (TTL).  At 100 TB each
table's sweep is independent and embarrassingly parallel across tables;
per-table work is bounded by partitions touched since the last sweep.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from incubator_horaedb_spark.table import Table


@dataclass
class MaintenanceReport:
    compacted_partitions: dict[str, int] = field(default_factory=dict)
    expired_segments: dict[str, int] = field(default_factory=dict)

    @property
    def total_compacted(self) -> int:
        return sum(self.compacted_partitions.values())

    @property
    def total_expired(self) -> int:
        return sum(self.expired_segments.values())


def run_maintenance(
    engine,
    *,
    tables: list[str] | None = None,
    now_ms: int | None = None,
    compact: bool = True,
    expire: bool = True,
) -> MaintenanceReport:
    """One sweep over ``tables`` (default: the whole catalog)."""
    report = MaintenanceReport()
    for name in tables if tables is not None else engine.catalog.list_tables():
        t = Table(engine.spark, engine.catalog, name)
        if expire:
            n = t.ttl_expire(now_ms=now_ms)
            if n:
                report.expired_segments[name] = n
        if compact:
            n = t.compact()
            if n:
                report.compacted_partitions[name] = n
    return report
