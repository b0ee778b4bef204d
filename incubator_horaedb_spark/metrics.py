"""Prometheus text-exposition metrics — the /metrics route's backing
store.

Reference: src/server/src/metrics.rs registers an
``http_handler_duration`` HistogramVec labeled (path, code) with
``exponential_buckets(0.01, 2.0, 15)`` and GET /metrics
(http.rs:532-536) dumps every registered family through the prometheus
TextEncoder.  This is the same surface without the prometheus crate: a
tiny thread-safe registry rendering the text exposition format
(https://prometheus.io/docs/instrumenting/exposition_formats/), which
any Prometheus scraper pointed at the reference can point at this
server unchanged.

Driver-side by design: metrics count serving-layer events (HTTP
requests, rows written per protocol); nothing here touches the
distributed data path.
"""

from __future__ import annotations

import threading


def exponential_buckets(start: float, factor: float, count: int) -> list[float]:
    """metrics.rs parity: 0.01, 0.02, ... (count buckets)."""
    out, v = [], start
    for _ in range(count):
        out.append(v)
        v *= factor
    return out


def _fmt(v: float) -> str:
    # Prometheus renders integral floats without the trailing .0
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def _label_str(names: tuple[str, ...], values: tuple[str, ...]) -> str:
    if not names:
        return ""
    inner = ",".join(
        f'{n}="{v.replace(chr(92), chr(92) * 2).replace(chr(34), chr(92) + chr(34))}"'
        for n, v in zip(names, values)
    )
    return "{" + inner + "}"


class CounterVec:
    def __init__(self, name: str, help_: str, labels: tuple[str, ...]):
        self.name, self.help, self.labels = name, help_, labels
        self._v: dict[tuple[str, ...], float] = {}
        self._lock = threading.Lock()

    def inc(self, *label_values: str, by: float = 1.0) -> None:
        key = tuple(str(v) for v in label_values)
        with self._lock:
            self._v[key] = self._v.get(key, 0.0) + by

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        with self._lock:
            items = sorted(self._v.items())
        for key, v in items:
            out.append(f"{self.name}{_label_str(self.labels, key)} {_fmt(v)}")
        return out


class HistogramVec:
    def __init__(
        self, name: str, help_: str, labels: tuple[str, ...], buckets: list[float]
    ):
        self.name, self.help, self.labels = name, help_, labels
        self.buckets = sorted(buckets)
        self._counts: dict[tuple[str, ...], list[int]] = {}
        self._sum: dict[tuple[str, ...], float] = {}
        self._n: dict[tuple[str, ...], int] = {}
        self._lock = threading.Lock()

    def observe(self, *label_values: str, value: float) -> None:
        key = tuple(str(v) for v in label_values)
        with self._lock:
            counts = self._counts.setdefault(key, [0] * len(self.buckets))
            for i, ub in enumerate(self.buckets):
                if value <= ub:
                    counts[i] += 1
            self._sum[key] = self._sum.get(key, 0.0) + value
            self._n[key] = self._n.get(key, 0) + 1

    def render(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        with self._lock:
            keys = sorted(self._counts)
            snapshot = {
                k: (list(self._counts[k]), self._sum[k], self._n[k]) for k in keys
            }
        for key in keys:
            counts, total, n = snapshot[key]
            for i, ub in enumerate(self.buckets):
                ls = _label_str(self.labels + ("le",), key + (_fmt(ub),))
                out.append(f"{self.name}_bucket{ls} {counts[i]}")
            ls_inf = _label_str(self.labels + ("le",), key + ("+Inf",))
            out.append(f"{self.name}_bucket{ls_inf} {n}")
            out.append(f"{self.name}_sum{_label_str(self.labels, key)} {_fmt(total)}")
            out.append(f"{self.name}_count{_label_str(self.labels, key)} {n}")
        return out


class Registry:
    """The server's metric families (metrics.rs lazy_static analogue)."""

    def __init__(self):
        self.http_handler_duration = HistogramVec(
            "http_handler_duration",
            "Bucketed histogram of http server handler",
            ("path", "code"),
            exponential_buckets(0.01, 2.0, 15),
        )
        self.write_rows = CounterVec(
            "write_rows_total",
            "Rows written through each ingest protocol",
            ("protocol",),
        )
        self.sql_queries = CounterVec(
            "sql_queries_total",
            "SQL statements served over HTTP by kind",
            ("kind",),
        )
        self.slow_queries = CounterVec(
            "slow_queries_total",
            "SQL statements slower than the /debug/slow_threshold setting",
            (),
        )

    def dump(self) -> str:
        lines: list[str] = []
        for fam in (
            self.http_handler_duration,
            self.write_rows,
            self.sql_queries,
            self.slow_queries,
        ):
            lines.extend(fam.render())
        return "\n".join(lines) + "\n"
