"""Second scale point (VERDICT r10 next-round #3): BENCH_SCALE stops at
10x, so the claimed linear/candidate-bounded curves were two-point
extrapolations.  This probe measures the three most expensive headline
queries at a THIRD point — a 50x documents/events slice (sf5, generated
by `tools/gen_scale_data.py out 50 documents events`) — and appends a
second-ratio table to BENCH_SCALE.md so the mechanism is confirmed (or
corrected) with three samples.

Usage: python tools/bench_scale_probe.py [sf1_dir] [sf5_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DIR = "/root/testdata/sf0.1"
PROBE_QUERIES = ["dedup_minhash_lsh", "dedup_incremental_lsh", "partitioned_scan_prune"]
MARKER = "## 100x probe (sf0.1 -> sf1 -> sf5)"


def bench(spark, qs, sf_dir: str, warm: int = 3, reps: int = 3) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in PROBE_QUERIES:
        runs = []
        for i in range(warm + reps):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            if i >= warm:
                runs.append(time.time() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(f"# {sf_dir} {name}: {out[name]}s", file=sys.stderr)
    return out


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    sf5_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf5"
    # generated tiers are gitignored (ADVICE r11: 103 MB of regenerable
    # parquet doesn't belong in clones) — build any missing tier on demand
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    for d, factor, tables in (
        (sf1_dir, "10", []),  # full four-table tier (sweeps need it too)
        (sf5_dir, "50", ["documents", "events"]),  # probe slice only
    ):
        if not os.path.isdir(d):
            print(f"# generating {d} (factor {factor})", file=sys.stderr)
            subprocess.run(
                [sys.executable, os.path.join(here, "gen_scale_data.py"),
                 d, factor, *tables],
                check=True,
            )
    from incubator_horaedb_spark import querybank
    from incubator_horaedb_spark.session import get_spark

    spark = get_spark("bench-scale-probe")
    spark.range(1).count()
    qs = querybank.queries()
    t1 = bench(spark, qs, BASE_DIR)
    t10 = bench(spark, qs, sf1_dir)
    t50 = bench(spark, qs, sf5_dir)

    lines = [
        MARKER,
        "",
        "Third scale sample (VERDICT r10 #3): a 50x documents/events slice",
        "(same distribution-matched generator, factor 50) gives the three",
        "most expensive headline queries a second ratio column.  If the 10x",
        "ratio were hiding a super-linear term, the 50x/10x column would",
        "blow past 5x; near-5x (the data ratio between the tiers) confirms",
        "the linear/candidate-bounded mechanism with three points.",
        "",
        "| query | sf0.1 (s) | sf1 (s) | sf5 (s) | sf1/sf0.1 | sf5/sf1 (data 5x) |",
        "|---|---|---|---|---|---|",
    ]
    for name in PROBE_QUERIES:
        r10 = t10[name] / t1[name] if t1[name] else float("nan")
        r50 = t50[name] / t10[name] if t10[name] else float("nan")
        lines.append(
            f"| {name} | {t1[name]} | {t10[name]} | {t50[name]} "
            f"| {r10:.1f}x | {r50:.1f}x |"
        )
    lines += [
        "",
        "Methodology notes: median of 3 after 3 warmups per tier (the",
        "fixture-building queries pay their one-time cost in the warmups);",
        "as of r11 dedup_incremental_lsh builds its persisted band index",
        "once per corpus (ADVICE r10), so the timed runs measure the",
        "steady-state delta-batch work — shingle/minhash the new batch and",
        "equi-join its bands against the standing index — which is the",
        "shape a daily-crawl deployment pays.",
        "",
        f"Generated: {time.strftime('%Y-%m-%d %H:%M:%S')}",
    ]
    section = "\n".join(lines) + "\n"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALE.md"
    )
    with open(path) as f:
        md = f.read()
    if MARKER in md:
        md = md[: md.index(MARKER)].rstrip() + "\n\n" + section
    else:
        md = md.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(md)
    print(section)


if __name__ == "__main__":
    main()
