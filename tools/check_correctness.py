"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, comparing row count, column names, and an
order-insensitive value hash (columns sorted by name, floats via repr,
rows sorted).  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from incubator_horaedb_spark.querybank.registry import TABLES


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def tolerance_problems(scols, srows, ocols, orows, vcol, rtol) -> list[str]:
    """Compare approx (spark) vs exact (oracle) per group key."""
    if sorted(scols) != sorted(ocols):
        return [f"cols spark={sorted(scols)} oracle={sorted(ocols)}"]
    if len(srows) != len(orows):
        return [f"rows spark={len(srows)} oracle={len(orows)}"]
    key_idx_s = [i for i, c in enumerate(scols) if c != vcol]
    v_s = scols.index(vcol)
    key_idx_o = [ocols.index(scols[i]) for i in key_idx_s]
    v_o = ocols.index(vcol)
    exact = {tuple(r[i] for i in key_idx_o): r[v_o] for r in orows}
    problems = []
    for r in srows:
        k = tuple(r[i] for i in key_idx_s)
        if k not in exact:
            problems.append(f"group {k} missing from oracle")
            continue
        e, a = exact[k], r[v_s]
        if abs(a - e) > max(rtol * e, 1):
            problems.append(f"group {k}: approx={a} exact={e} beyond tol")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # SPARK_GRAFT_EXCLUDE: comma-separated names to skip entirely
    # (emergency hatch; sweeps should not need it since r12)
    excluded = {
        x for x in os.environ.get("SPARK_GRAFT_EXCLUDE", "").split(",") if x
    }
    # SPARK_GRAFT_QUAR_ORACLE=1 (VERDICT r11 #4): at tiers where the two
    # quadratic-BY-SPEC all-pairs oracles are intractable (sf1+), still
    # RUN the Spark side of those queries but skip only the DuckDB
    # compare, reporting them on an explicit quarantine tier — the sweep
    # line stays "full bank, 0 excluded" and the quarantined set is the
    # reviewed literal registry.QUADRATIC_ORACLES, not a growable env var.
    quarantine_oracle = bool(os.environ.get("SPARK_GRAFT_QUAR_ORACLE"))

    from incubator_horaedb_spark import querybank

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # Driver simulation (VERDICT r02 #2): a PLAIN SparkSession — no
        # tuned confs, exactly what the grading driver builds.  Queries
        # must set any result-affecting conf themselves (registry.load).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from incubator_horaedb_spark.session import get_spark

        spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            # partial tiers (the generated sf1 dir ships a table subset);
            # only queries touching the absent table will fail, loudly
            pass

    from incubator_horaedb_spark.querybank.registry import QUADRATIC_ORACLES

    qs, os_ = querybank.queries(), querybank.oracles()
    tols = querybank.tolerance_oracles()
    failures = 0
    n_checked = 0
    n_quarantined = 0
    for name, fn in qs.items():
        if (only and name not in only) or name in excluded:
            continue
        n_checked += 1
        t0 = time.time()
        if quarantine_oracle and QUADRATIC_ORACLES.get(name) == "both":
            n_quarantined += 1
            print(
                f"QUAR  {name}: quadratic-by-spec exact baseline "
                "quarantined at this tier — the query IS the all-pairs "
                "yardstick; its blocked/LSH scale-path twins are fully "
                "checked in this sweep (registry.QUADRATIC_ORACLES)"
            )
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        if quarantine_oracle and QUADRATIC_ORACLES.get(name) == "oracle":
            n_quarantined += 1
            print(
                f"QUAR  {name}: engine ran ({len(srows)} rows, "
                f"{time.time()-t0:.1f}s); quadratic-by-spec oracle "
                "quarantined at this tier (registry.QUADRATIC_ORACLES)"
            )
            continue
        if name not in os_:
            tol = tols.get(name)
            if tol is None:
                print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
                continue
            # tolerance oracle: exact values from DuckDB, approx within
            # max(rel_tol·exact, 1) per group (HLL error-bound check)
            sql, vcol, rtol = tol
            try:
                res = con.execute(sql)
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
            except Exception:
                print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
                failures += 1
                continue
            problems = tolerance_problems(scols, srows, ocols, orows, vcol, rtol)
            if problems:
                print(f"FAIL  {name}: {'; '.join(problems)}")
                failures += 1
            else:
                print(
                    f"OK~   {name}: within {rtol:.3f} rel tol "
                    f"({len(srows)} groups, {time.time()-t0:.1f}s)"
                )
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures += 1
            continue
        problems = []
        # The grading driver fetches the oracle through pandas/Arrow, where
        # DuckDB HUGEINT (sum of BIGINT) degrades to float64/decimal128 and
        # hashes as `4950.0` against Spark's `4950` — invisible to the
        # .fetchall() path above (VERDICT r03 #1: two rounds of driver-red
        # with a green local harness).  Probe the result's Arrow schema and
        # fail any type that diverges between fetch paths.
        try:
            sch = con.execute(f"SELECT * FROM ({os_[name]}) __q LIMIT 0").arrow().schema
            bad_types = [
                f"{f.name}:{f.type}"
                for f in sch
                if "decimal" in str(f.type) or str(f.type).startswith("uint")
            ]
            if bad_types:
                problems.append(
                    "oracle type not driver-safe (HUGEINT/decimal/uint "
                    f"renders differently under pandas fetch): {bad_types} "
                    "— CAST the final aggregate to BIGINT/DOUBLE"
                )
        except Exception:
            pass  # arrow probe is advisory; the value compare below still runs
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs, ho = table_digest(scols, srows), table_digest(ocols, orows)
            if hs != ho:
                problems.append(f"hash spark={hs} oracle={ho}")
                # show a few differing lines for debugging
                so = sorted(
                    "\x1f".join(
                        _norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "\x1f".join(
                        _norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                diffs = [(a, b) for a, b in zip(so, oo) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:200]}\n      oracle: {b[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    checked = n_checked
    quar = (
        f" ({n_quarantined} quadratic-by-spec quarantined — see QUAR lines)"
        if n_quarantined
        else ""
    )
    print(f"\n{failures} failures / {checked} checked{quar}")
    record = os.environ.get("SPARK_GRAFT_RECORD")
    if record:
        # machine-emitted round-close record (VERDICT r06 next-round #6):
        # the sweep writes its own counts so the record never needs
        # hand-written arithmetic
        import datetime
        import subprocess

        try:
            head = subprocess.run(
                ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        except Exception:
            head = "?"
        mode = "plain" if os.environ.get("SPARK_GRAFT_PLAIN") else "tuned"
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%SZ"
        )
        scope = f"subset={len(only)}" if only else "full-bank"
        if excluded:
            scope += f" excl={','.join(sorted(excluded))}"
        if n_quarantined:
            scope += f" oracle-quarantined={n_quarantined}"
        with open(record, "a", encoding="utf-8") as fh:
            fh.write(
                f"- sweep {stamp} | HEAD {head} | sf_dir={sf_dir} | "
                f"mode={mode} | bank={len(querybank.QUERIES)} | {scope} | "
                f"checked={checked} | failures={failures}\n"
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
