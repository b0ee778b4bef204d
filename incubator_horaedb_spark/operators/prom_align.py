"""PromAlign — Prometheus-style range functions on aligned step grids.

Port of the reference's custom logical/physical operator
(src/query_engine/src/datafusion_impl/physical_plan_extension/prom_align.rs:142-998):
for each series, walk samples with (align_range, step, lookback_delta) and
evaluate a range function at every step.  Exact semantics replicated here
(verified against prom_align.rs):

- window for step ``t`` = samples with ts in **[t - lookback, t]**, both ends
  inclusive (FixedStepper: ``mint = t - lookback_delta``, entries dropped
  while ``ts < mint``; tail advanced while ``ts <= t``).
- steps with an empty window are skipped (no output row).
- rate/increase/delta (extrapolate_fn_helper, prom_align.rs:743-838):
  need ≥2 samples; ``difference = last - first + counter_reset_correction``
  where the correction adds the *previous* value at every in-window reset;
  extrapolate to ``data_duration + range_to_start + range_to_end`` with
  (a) counter zero-point shortening applied BEFORE (b) the 1.1×avg-interval
  threshold clamp to avg/2 — in that order, matching the reference (which
  differs from modern Prometheus);
  rate divides by ``lookback_delta`` seconds.
- irate/idelta (instant_value, prom_align.rs:917-945): need ≥3 in-window
  samples (reference requires ``tail_index >= 2`` — a stricter-than-Prometheus
  quirk, ported faithfully); use last two samples; irate treats
  ``last < prev`` as a counter reset (value = last) and divides by their gap
  in seconds.
- instant (InstantFunc, prom_align.rs:978-998): newest sample value ≤ t.

Spark-first design — **no Python UDF anywhere**: each sample is exploded to
the step indices whose window contains it (`sequence` + `explode`, map-side,
fan-out = lookback/step), then one hash aggregation per (series, step)
computes first/last via ``min_by``/``max_by`` and the reset correction from
pre-computed ``lag`` columns.  At 100 TB this is a single shuffle keyed on
(series, step) with partial aggregation; there is no per-series collect and
no skew beyond genuinely hot series (salt-able on the tsid if needed).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXTRAPOLATION_COEFF = 1.1  # prom_align.rs:59
DEFAULT_LOOKBACK_MS = 300_000  # promql/convert.rs:55

# Reference surface (prom_align.rs PromFunc): the extrapolation family +
# instant-value family + instant selector.
ALIGN_FUNCS = ("rate", "increase", "delta", "irate", "idelta", "instant")
# Beyond-reference extension: the Prometheus `*_over_time` window
# aggregates, same window definition ([t - lookback, t], empty windows
# skipped), no extrapolation — pure window aggregation on the same
# explode-to-grid plan.  Float sums are dyadic-quantized per addend
# (functions/detfloat.py) so the result is order-independent and
# bit-reproducible against the SQL oracle.
OVER_TIME_FUNCS = (
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
    "count_over_time",
    "last_over_time",
    # counter/series hygiene (Prometheus changes()/resets()): counts over
    # consecutive in-window sample pairs — the predecessor columns the
    # reset-correction already computes make these free
    "changes",
    "resets",
    # dispersion (Prometheus stddev/stdvar_over_time): population variance
    # via sum-of-squares; addends quantized at 2^-10 so squares sit on the
    # exact 2^-20 grid (|value| < 2^10 → 40-bit terms, window sums < 53)
    "stdvar_over_time",
    "stddev_over_time",
    # Prometheus quantile_over_time: linear interpolation between the two
    # order statistics around rank q*(n-1).  NOT the engine-native
    # percentile/quantile_cont — their interpolation expression trees are
    # not guaranteed ulp-identical across engines, so both sides compute
    # the same explicit lo + frac*(hi - lo) over the same sorted
    # quantized window (window cardinality is bounded by
    # lookback/scrape-interval, so the per-group array is small).
    "quantile_over_time",
    # Prometheus deriv()/predict_linear(): simple least-squares over the
    # window samples.  Timestamps enter as integer offsets RELATIVE TO THE
    # STEP (t_rel = sample_ts - step_ts, |t_rel| <= lookback), so the
    # moment sums are exact: t_rel and t_rel^2 are integers, v is
    # 2^-10-quantized, t_rel*v sits on the 2^-10 grid with |term| < 2^43 —
    # every aggregate is reduction-order-independent, and the closed-form
    # slope/intercept divisions are the identical IEEE tree on both
    # engines.
    "deriv",
    "predict_linear",
    # Prometheus holt_winters() (renamed double_exponential_smoothing in
    # Prometheus 3): an ORDERED fold over the window samples — state
    # (s0, s1, b) updated per sample in time order (functions.go
    # funcDoubleExponentialSmoothing / calcTrendValue).  Both engines run
    # the IDENTICAL expression tree (shared _holt_winters_value_sql) as a
    # struct fold over the time-sorted window array (Spark `aggregate`,
    # DuckDB `list_reduce`), so the fixed fold order makes results
    # bit-identical without quantization.  Window arrays are bounded by
    # lookback/scrape-interval, same as quantile_over_time.
    "holt_winters",
)
# predict_linear horizon (seconds ahead of the step timestamp)
PREDICT_LINEAR_OFFSET_S = 600
# Functions whose math reads an ORDER among samples (first/last extraction,
# lag-based predecessor pairs): duplicate-timestamp samples within a series
# make that order engine-dependent (Spark's min_by/lag and DuckDB's
# arg_min/lag tie-break differently — found by the sf1 sweep, where the 10×
# events table carries duplicate (series, ts) pairs).  For these functions
# the series is DEDUPED first: samples sharing (series, ts) merge to their
# MAX value — the deterministic surrogate for the reference's
# last-writer-wins merge iterator (table.py dedup-on-read; raw parquet has
# no __seq).  Order-symmetric aggregates (sums/counts/min/max/sorted
# quantiles) are reduction-order-independent and read the raw multiset.
_DEDUP_FUNCS = frozenset(
    ("rate", "increase", "delta", "irate", "idelta", "instant",
     "last_over_time", "changes", "resets",
     # the holt_winters fold reads samples in time order — duplicate
     # timestamps would make the fold order engine-dependent
     "holt_winters")
)
_Q = 1 << 20  # quantization for order-independent sums (BITS_SMALL)
_Q2 = 1 << 10  # coarser grid for squared addends (exactness bound above)


def prom_align(
    df: DataFrame,
    func: str,
    *,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    offset_ms: int = 0,
    quantile: float = 0.75,
    predict_offset_s: "int | float | None" = None,
    hw_sf: float = 0.5,
    hw_tf: float = 0.3,
) -> DataFrame:
    """Evaluate ``func`` per series on the aligned grid.

    ``offset_ms`` is the PromQL ``offset`` modifier: the reference shifts
    every sample timestamp forward by the offset before stepping
    (PromAlignReader::step_helper, prom_align.rs:273-289), so step ``t``
    sees samples from ``[t - offset - lookback, t - offset]``.

    Returns columns: ``*series_cols, ts (timestamp), value (double)``.
    The grid is ``t = start_ms + k*step_ms`` for ``k in [0, (end-start)/step]``
    (FixedStepper starts at the align-range start and advances by ``step``).
    """
    if func not in ALIGN_FUNCS + OVER_TIME_FUNCS:
        raise ValueError(
            f"unknown align func {func!r}; expected one of {ALIGN_FUNCS + OVER_TIME_FUNCS}"
        )
    is_counter = func in ("rate", "increase")
    is_rate = func == "rate"

    n_steps = (end_ms - start_ms) // step_ms  # k ranges over [0, n_steps]

    # r12 NOTE (guide §5, driver overhead): this builder used to assemble
    # every expression from pyspark Column objects — ~170 py4j round-trips
    # per construction, 0.4-1.1 s of pure driver time PER QUERY BUILD at
    # bench scale.  The same expression trees are now rendered as SQL
    # strings (selectExpr / F.expr, windows inline in OVER clauses) — a
    # handful of py4j calls.  Every fragment mirrors the Column form it
    # replaced 1:1 (double literals via CAST(x AS DOUBLE) where the Column
    # form used F.lit(float), integer arithmetic association preserved), so
    # the analyzed plan — and therefore the result hash — is unchanged;
    # the property tests compare against the Python model and every
    # promql_* query stays oracle-gated.
    series_q = ", ".join(f"`{c}`" for c in series_cols)

    base = df.selectExpr(
        *[f"`{c}`" for c in series_cols],
        f"(unix_millis(`{ts_col}`) + {offset_ms}) AS __ts",
        f"CAST(`{value_col}` AS DOUBLE) AS __val",
    ).where(f"__ts >= {start_ms - lookback_ms} AND __ts <= {end_ms}")

    # Duplicate-timestamp dedup for order-sensitive functions (_DEDUP_FUNCS
    # rationale above): the last row of each (series, ts) group under a
    # (ts, value) sort is the max-value survivor, and the lead() trick
    # keeps this at ONE series-keyed exchange — the lag window below reuses
    # the same partitioning and sort prefix.
    needs_lag = func in ("rate", "increase", "irate", "idelta", "changes", "resets")
    if func in _DEDUP_FUNCS:
        if needs_lag:
            # the lag window below needs a (series)-keyed sort anyway, so
            # dedup rides the same exchange: the last row of each
            # (series, ts) group under a (ts, value) sort is the
            # max-value survivor
            base = (
                base.selectExpr(
                    "*",
                    f"lead(__ts) OVER (PARTITION BY {series_q} "
                    "ORDER BY __ts, __val) AS __lead_ts",
                )
                .where("__lead_ts IS NULL OR __lead_ts <> __ts")
                .drop("__lead_ts")
            )
        elif func in ("delta", "holt_winters"):
            # no lag needed but the math reads more than the newest sample
            # (delta: both window ends; holt_winters: the whole ordered
            # window): a partial/final hash agg dedups without any sort —
            # map-side combine keeps the extra exchange cheap at scale
            # (result identical to the oracle's lead-filter dedup: the
            # max-value survivor per (series, ts))
            base = base.groupBy(*series_cols, "__ts").agg(
                F.expr("max(__val) AS __val")
            )
        # instant / last_over_time need NO pre-pass at all: their only
        # order-sensitive read is last_val, whose struct-max aggregate
        # below is tie-safe by itself (max (ts, value) = newest sample,
        # max value among duplicates) — zero extra exchange (the bench
        # cost of the r6 hash-agg dedup was promql_instant +49%)

    # Per-series lag: previous sample's (ts, value).  In-window sample sets
    # are contiguous per series, so the in-window predecessor of a sample is
    # exactly its series predecessor when that predecessor's ts >= mint.
    # Only counter/instant-pair/changes families read the predecessor —
    # for everything else the window (a full series-keyed shuffle + sort)
    # is skipped outright.  Timestamps are unique per series here (dedup
    # above), so the sort key is unambiguous.
    if needs_lag:
        over = f"OVER (PARTITION BY {series_q} ORDER BY __ts)"
        base = base.selectExpr(
            "*",
            f"lag(__ts) {over} AS __prev_ts",
            f"lag(__val) {over} AS __prev_val",
        )

    # Explode each sample to the step indices whose window [t-lookback, t]
    # contains it:  k in [ceil((ts-start)/step), floor((ts+lookback-start)/step)].
    # Guard: when lookback < step a sample may fall in no window (k_lo > k_hi);
    # Spark's sequence() would generate a *descending* range there, so gate it.
    k_lo = f"greatest(-floor(({start_ms} - __ts) / {step_ms}), 0)"
    k_hi = f"least(floor(((__ts + {lookback_ms}) - {start_ms}) / {step_ms}), {n_steps})"
    ks = (
        f"CASE WHEN ({k_hi}) >= ({k_lo}) THEN sequence({k_lo}, {k_hi}) "
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    # __t and __mint both derive from __k alone, so one projection computes
    # both (the optimizer collapses adjacent projects anyway — this just
    # saves one analysis pass at build time)
    _t_sql = f"CAST({start_ms} + __k * {step_ms} AS BIGINT)"
    exploded = base.selectExpr("*", f"explode({ks}) AS __k").selectExpr(
        "*",
        f"{_t_sql} AS __t",
        f"({_t_sql} - {lookback_ms}) AS __mint",
    )

    prev_in_window = "__prev_ts IS NOT NULL AND __prev_ts >= __mint"
    _half = "CAST(0.5 AS DOUBLE)"
    _vq = f"(CAST(floor((__val * {_Q}) + {_half}) AS DOUBLE) / {_Q})"
    _vq2 = f"(CAST(floor(__val * {_Q2} + {_half}) AS DOUBLE) / {_Q2})"
    # Aggregate catalog — each func family pays ONLY for the columns it
    # reads (computing all 12 for every func cost rate +22% / instant +49%
    # at sf0.1, VERDICT r02).  `n` is always included (the sample-count
    # filters need it).
    agg_exprs = {
        "first_ts": "min(__ts) AS first_ts",
        "last_ts": "max(__ts) AS last_ts",
        "first_val": "min_by(__val, __ts) AS first_val",
        # lexicographic struct max = newest sample, MAX VALUE on duplicate
        # timestamps — tie-safe without any pre-dedup (max_by's duplicate
        # tie-break is engine-dependent; found by the sf1 sweep)
        "last_val": "max(struct(__ts, __val)).__val AS last_val",
        # Counter reset correction: sum of previous values at in-window
        # resets.  Addends are dyadic-quantized (functions/detfloat.py) so
        # the group sum is exact and order-independent — the only
        # order-sensitive float sum in this operator (deviation from the
        # reference math <= 2^-21 per reset, invisible at 6-digit rounding).
        "reset_corr": (
            f"sum(CASE WHEN {prev_in_window} AND __val < __prev_val "
            f"THEN CAST(floor((__prev_val * {1 << 20}) + {_half}) AS DOUBLE) / {1 << 20} "
            "ELSE CAST(0.0 AS DOUBLE) END) AS reset_corr"
        ),
        # second-last in-window sample = the series-predecessor of the last
        "second_last_ts": "max_by(__prev_ts, __ts) AS second_last_ts",
        "second_last_val": "max_by(__prev_val, __ts) AS second_last_val",
        # *_over_time inputs: min/max exact; sum over dyadic-quantized
        # addends so the aggregation order cannot change the result
        "val_min": "min(__val) AS val_min",
        "val_max": "max(__val) AS val_max",
        "val_sum_q": f"sum({_vq}) AS val_sum_q",
        # dispersion inputs: tie-proof floor quantization at the coarser
        # 2^-10 grid (squares are then exact multiples of 2^-20)
        "val_sum_q2": f"sum({_vq2}) AS val_sum_q2",
        "val_sumsq_q": f"sum({_vq2} * {_vq2}) AS val_sumsq_q",
        # changes()/resets(): consecutive-pair counters (exact integers)
        "n_changes": (
            f"sum(CASE WHEN {prev_in_window} AND __val <> __prev_val "
            "THEN 1 ELSE 0 END) AS n_changes"
        ),
        "n_resets": (
            f"sum(CASE WHEN {prev_in_window} AND __val < __prev_val "
            "THEN 1 ELSE 0 END) AS n_resets"
        ),
        # quantile_over_time input: the sorted quantized window values.
        # collect_list is bounded by the per-window sample count
        # (lookback / scrape interval), not the series length.
        "vals_sorted": f"sort_array(collect_list({_vq})) AS vals_sorted",
        # holt_winters input: the window samples time-sorted (struct sort
        # key = (t, v); t unique after dedup).  Bounded like vals_sorted.
        "ts_vals_sorted": (
            "sort_array(collect_list(named_struct('t', __ts, 'v', __val))) "
            "AS ts_vals_sorted"
        ),
        # least-squares moments for deriv/predict_linear: integer t_rel
        # offsets and 2^-10-quantized values (exactness argument at
        # OVER_TIME_FUNCS)
        "lr_t": "sum(__ts - __t) AS lr_t",
        "lr_tv": f"sum(CAST(__ts - __t AS DOUBLE) * {_vq2}) AS lr_tv",
        "lr_tt": "sum((__ts - __t) * (__ts - __t)) AS lr_tt",
    }
    needed_by_func = {
        "rate": ["first_ts", "last_ts", "first_val", "last_val", "reset_corr"],
        "increase": ["first_ts", "last_ts", "first_val", "last_val", "reset_corr"],
        "delta": ["first_ts", "last_ts", "first_val", "last_val"],
        "irate": ["last_ts", "second_last_ts", "last_val", "second_last_val"],
        "idelta": ["last_ts", "second_last_ts", "last_val", "second_last_val"],
        "instant": ["last_val"],
        "avg_over_time": ["val_sum_q"],
        "min_over_time": ["val_min"],
        "max_over_time": ["val_max"],
        "sum_over_time": ["val_sum_q"],
        "count_over_time": [],
        "last_over_time": ["last_val"],
        "changes": ["n_changes"],
        "resets": ["n_resets"],
        "stdvar_over_time": ["val_sum_q2", "val_sumsq_q"],
        "stddev_over_time": ["val_sum_q2", "val_sumsq_q"],
        "quantile_over_time": ["vals_sorted"],
        "deriv": ["lr_t", "val_sum_q2", "lr_tv", "lr_tt"],
        "predict_linear": ["lr_t", "val_sum_q2", "lr_tv", "lr_tt"],
        "holt_winters": ["ts_vals_sorted"],
    }
    agg = exploded.groupBy(*series_cols, "__t").agg(
        F.expr("count(1) AS n"),
        *[F.expr(agg_exprs[c]) for c in needed_by_func[func]],
    )

    if func in OVER_TIME_FUNCS:
        # population variance; greatest(,0) guards the -epsilon a constant
        # window can produce from the two inexact divisions (identical on
        # both engines, but sqrt of a negative diverges)
        out_val = {
            "avg_over_time": "val_sum_q / n",
            "min_over_time": "val_min",
            "max_over_time": "val_max",
            "sum_over_time": "val_sum_q",
            "count_over_time": "CAST(n AS DOUBLE)",
            "last_over_time": "last_val",
            "changes": "CAST(n_changes AS DOUBLE)",
            "resets": "CAST(n_resets AS DOUBLE)",
            "stdvar_over_time": _VAR_SQL,
            "stddev_over_time": f"sqrt({_VAR_SQL})",
            "quantile_over_time": _quantile_expr_sql("spark", quantile),
            "deriv": _linreg_value_sql("deriv"),
            "predict_linear": _linreg_value_sql(
                "predict_linear", offset_s=predict_offset_s
            ),
            "holt_winters": _holt_winters_value_sql("spark", hw_sf, hw_tf),
        }[func]
        result = agg.selectExpr("*", f"({out_val}) AS value")
        if func in ("deriv", "predict_linear"):
            # least squares needs >= 2 samples and time variance in the
            # window (Prometheus returns no point otherwise)
            result = result.where(_LINREG_GUARD_SQL)
        elif func == "holt_winters":
            # the fold needs an initial trend v1 - v0 (functions.go: < 2
            # samples → no output point)
            result = result.where("n >= 2")
    elif func == "instant":
        result = agg.selectExpr("*", "last_val AS value")
    elif func in ("irate", "idelta"):
        # instant_value: requires tail_index >= 2, i.e. >= 3 in-window samples.
        if func == "irate":
            out_val = (
                "(CASE WHEN last_val < second_last_val THEN last_val "
                "ELSE last_val - second_last_val END) "
                "/ ((last_ts - second_last_ts) / CAST(1000.0 AS DOUBLE))"
            )
        else:
            out_val = "last_val - second_last_val"
        result = agg.where("n >= 3").selectExpr("*", f"({out_val}) AS value")
    else:
        # extrapolate_fn_helper: requires tail_index >= 1, i.e. >= 2 samples.
        # Composition identical to the Column form this replaced: the
        # shared sub-expressions are textually inlined, which re-renders
        # the same expression tree the Column DAG produced.
        corr = " + reset_corr" if is_counter else " + CAST(0.0 AS DOUBLE)"
        diff = f"(last_val - first_val{corr})"
        dd = "CAST(last_ts - first_ts AS DOUBLE)"
        avg_dur = f"({dd} / (n - 1))"
        rts0 = f"CAST(first_ts - (__t - {lookback_ms}) AS DOUBLE)"
        if is_counter:
            zp = f"({dd} * first_val / {diff})"
            rts1 = (
                f"(CASE WHEN ({diff} > 0) AND (first_val >= 0) "
                f"THEN least({rts0}, {zp}) ELSE {rts0} END)"
            )
        else:
            rts1 = rts0
        thr = f"({avg_dur} * {EXTRAPOLATION_COEFF!r})"
        rts = f"(CASE WHEN {rts1} > {thr} THEN {avg_dur} / 2 ELSE {rts1} END)"
        rte0 = "CAST(__t - last_ts AS DOUBLE)"
        rte = f"(CASE WHEN {rte0} > {thr} THEN {avg_dur} / 2 ELSE {rte0} END)"
        extrapolated = f"{diff} * ({dd} + {rts} + {rte}) / {dd}"
        if is_rate:
            extrapolated = (
                f"({extrapolated}) / CAST({lookback_ms / 1000.0!r} AS DOUBLE)"
            )
        result = agg.where("n >= 2 AND last_ts > first_ts").selectExpr(
            "*", f"({extrapolated}) AS value"
        )

    return result.selectExpr(
        *[f"`{c}`" for c in series_cols],
        "timestamp_millis(__t) AS ts",
        "CAST(value AS DOUBLE) AS value",
    )


# oracle rendering of the population variance, identical association to
# the Spark column expression (greatest guards sqrt(-epsilon))
_VAR_SQL = (
    "greatest(val_sumsq_q / n - (val_sum_q2 / n) * (val_sum_q2 / n), 0.0)"
)


_LINREG_GUARD_SQL = "n >= 2 AND n * lr_tt - lr_t * lr_t <> 0"


def _linreg_value_sql(which: str, offset_s: "int | float | None" = None) -> str:
    """deriv/predict_linear closed forms over the moment columns — one
    shared SQL string per engine-agnostic expression tree (lr_* and
    val_sum_q2 are exact sums, so the only doubles are these divisions)."""
    slope = (
        "((CAST(n AS DOUBLE) * lr_tv - CAST(lr_t AS DOUBLE) * val_sum_q2)"
        " / CAST(n * lr_tt - lr_t * lr_t AS DOUBLE))"
    )
    if which == "deriv":
        return f"({slope} * 1000.0)"  # per-ms slope → per-second
    if offset_s is None:
        offset_s = PREDICT_LINEAR_OFFSET_S
    return (
        f"(((val_sum_q2 - {slope} * CAST(lr_t AS DOUBLE)) / CAST(n AS DOUBLE))"
        f" + {slope} * {float(offset_s) * 1000.0!r})"  # repr: fractional horizons survive
    )


def _quantile_expr_sql(engine: str, q: float) -> str:
    """Rank-interpolation quantile over the sorted window array, the SAME
    arithmetic tree on both engines (lo + frac*(hi - lo) at rank q*(n-1));
    only the list-indexing builtin differs."""
    at = "element_at" if engine == "spark" else "list_extract"
    h = f"(CAST(n - 1 AS DOUBLE) * {q!r})"
    k1 = f"(CAST(floor({h}) AS INT) + 1)"
    k2 = f"least(CAST(floor({h}) AS INT) + 2, CAST(n AS INT))"
    lo = f"{at}(vals_sorted, {k1})"
    hi = f"{at}(vals_sorted, {k2})"
    return f"({lo} + ({h} - floor({h})) * ({hi} - {lo}))"


def _holt_winters_value_sql(engine: str, sf: float, tf: float) -> str:
    """Prometheus double-exponential smoothing as a struct fold over the
    time-sorted window array (functions.go funcDoubleExponentialSmoothing:
    s1←v0, b←v1−v0, then per sample b←tf·(s1−s0)+(1−tf)·b from the third
    sample on, s←sf·v+(1−sf)·(s1+b)).  The SAME IEEE expression tree on
    both engines — the fold order is fixed (time order, timestamps unique
    after dedup), so results are bit-identical without quantization.  The
    1−sf / 1−tf complements are computed HERE in Python and rendered with
    repr so both engines receive the identical double literal."""
    # State is a DOUBLE list [s0, s1, b, i], NOT a struct: DuckDB 1.0's
    # lambda engine resolves same-named struct-field references across the
    # output struct literal (an `acc.s1` outside the 's1' field expression
    # reads the NEW s1 — observed, silently wrong), while positional list
    # access is unambiguous on both engines.  `i` rides as a double (list
    # elements are uniform); it only ever holds small exact integers.
    csf, ctf = repr(float(sf)), repr(float(tf))
    c1sf, c1tf = repr(1.0 - float(sf)), repr(1.0 - float(tf))
    at = "element_at" if engine == "spark" else "list_extract"

    def a(n: int) -> str:
        return f"{at}(acc, {n})"

    b = (
        f"(CASE WHEN {a(4)} = 0 THEN {at}(x, 2) - {a(2)} "
        f"ELSE CAST({ctf} AS DOUBLE) * ({a(2)} - {a(1)}) "
        f"+ CAST({c1tf} AS DOUBLE) * {a(3)} END)"
    )
    s1 = (
        f"CAST({csf} AS DOUBLE) * {at}(x, 2) "
        f"+ CAST({c1sf} AS DOUBLE) * ({a(2)} + {b})"
    )
    mklist = "array" if engine == "spark" else "list_value"
    nxt = f"{mklist}({a(2)}, {s1}, {b}, {a(4)} + CAST(1.0 AS DOUBLE))"
    init = (
        f"{mklist}(CAST(0.0 AS DOUBLE), CAST(e.v AS DOUBLE), "
        "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))"
    )
    lam = f"(acc, x) -> {nxt}"
    if engine == "spark":
        states = f"transform(ts_vals_sorted, e -> {init})"
        return (
            f"aggregate(slice({states}, 2, size(ts_vals_sorted) - 1), "
            f"element_at({states}, 1), {lam}, acc -> element_at(acc, 2))"
        )
    states = f"list_transform(ts_vals_sorted, e -> {init})"
    # list_reduce seeds with the FIRST element and folds the rest — the
    # exact Spark slice-from-2 fold with element 1 as the initial state
    return f"list_extract(list_reduce({states}, {lam}), 2)"


def prom_align_oracle_sql(
    func: str,
    *,
    table: str,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    offset_ms: int = 0,
    round_digits: int | None = 6,
    series_filter_sql: str = "TRUE",
    quantile: float = 0.75,
    predict_offset_s: "int | float | None" = None,
    hw_sf: float = 0.5,
    hw_tf: float = 0.3,
) -> str:
    """DuckDB SQL computing the identical PromAlign result — generated from
    the same parameters so the Spark pipeline and the oracle cannot drift.
    Used by the correctness gate.  ``offset_ms`` mirrors the Spark side's
    shift-timestamps-before-stepping (step_helper, prom_align.rs:273-289)."""
    if func not in ALIGN_FUNCS + OVER_TIME_FUNCS:
        raise ValueError(func)
    is_counter = func in ("rate", "increase")
    n_steps = (end_ms - start_ms) // step_ms
    series = ", ".join(series_cols)
    shifted = f"(epoch_ms({ts_col}) + {offset_ms})"

    if func in _DEDUP_FUNCS:
        # identical duplicate-timestamp dedup as the Spark side: the
        # last row of each (series, sts) group under a (sts, val) sort
        # survives (max value), then lag runs over the deduped series
        src = f"""(
      SELECT {series}, sts, val FROM (
        SELECT {series}, {shifted} AS sts, CAST({value_col} AS DOUBLE) AS val,
               lead({shifted}) OVER (PARTITION BY {series}
                 ORDER BY {shifted}, CAST({value_col} AS DOUBLE)) AS lead_ts
        FROM {table}
        WHERE {shifted} >= {start_ms - lookback_ms} AND {shifted} <= {end_ms}
          AND ({series_filter_sql})
      ) __d WHERE lead_ts IS NULL OR lead_ts <> sts
    )"""
        base = f"""
    WITH base AS (
      SELECT {series}, sts, val,
             lag(sts) OVER (PARTITION BY {series} ORDER BY sts) AS prev_ts,
             lag(val) OVER (PARTITION BY {series} ORDER BY sts) AS prev_val
      FROM {src} __s
    ), exploded AS ("""
    else:
        base = f"""
    WITH base AS (
      SELECT {series},
             {shifted} AS sts,
             CAST({value_col} AS DOUBLE) AS val,
             lag({shifted}) OVER (PARTITION BY {series} ORDER BY {shifted}) AS prev_ts,
             lag(CAST({value_col} AS DOUBLE)) OVER (PARTITION BY {series} ORDER BY {shifted}) AS prev_val
      FROM {table}
      WHERE {shifted} >= {start_ms - lookback_ms} AND {shifted} <= {end_ms}
        AND ({series_filter_sql})
    ), exploded AS ("""
    base += f"""
      SELECT b.*, ({start_ms} + k.k * {step_ms}) AS t
      FROM base b
      JOIN (SELECT unnest(range(0, {n_steps + 1})) AS k) k
        ON ({start_ms} + k.k * {step_ms}) >= b.sts
       AND ({start_ms} + k.k * {step_ms}) - {lookback_ms} <= b.sts
    ), agg AS (
      SELECT {series}, t,
             count(*) AS n,
             min(sts) AS first_ts,
             max(sts) AS last_ts,
             arg_min(val, sts) AS first_val,
             arg_max(val, sts) AS last_val,
             sum(CASE WHEN prev_ts IS NOT NULL AND prev_ts >= t - {lookback_ms}
                       AND val < prev_val
                      THEN CAST(floor((prev_val * 1048576) + 0.5) AS DOUBLE) / 1048576 ELSE 0.0 END) AS reset_corr,
             arg_max(prev_ts, sts) AS second_last_ts,
             arg_max(prev_val, sts) AS second_last_val,
             min(val) AS val_min,
             max(val) AS val_max,
             sum(CAST(floor((val * {_Q}) + 0.5) AS DOUBLE) / {_Q}) AS val_sum_q,
             sum(CAST(floor(val * {_Q2} + 0.5) AS DOUBLE) / {_Q2}) AS val_sum_q2,
             sum((CAST(floor(val * {_Q2} + 0.5) AS DOUBLE) / {_Q2})
                 * (CAST(floor(val * {_Q2} + 0.5) AS DOUBLE) / {_Q2})) AS val_sumsq_q,
             sum(CASE WHEN prev_ts IS NOT NULL AND prev_ts >= t - {lookback_ms}
                       AND val <> prev_val THEN 1 ELSE 0 END) AS n_changes,
             sum(CASE WHEN prev_ts IS NOT NULL AND prev_ts >= t - {lookback_ms}
                       AND val < prev_val THEN 1 ELSE 0 END) AS n_resets,
             list_sort(list(CAST(floor((val * {_Q}) + 0.5) AS DOUBLE) / {_Q})) AS vals_sorted,
             list_sort(list(struct_pack(t := sts, v := val))) AS ts_vals_sorted,
             sum(sts - t) AS lr_t,
             sum(CAST(sts - t AS DOUBLE)
                 * (CAST(floor(val * {_Q2} + 0.5) AS DOUBLE) / {_Q2})) AS lr_tv,
             sum((sts - t) * (sts - t)) AS lr_tt
      FROM exploded
      GROUP BY {series}, t
    )"""

    if func in OVER_TIME_FUNCS:
        value_sql = {
            "avg_over_time": "val_sum_q / n",
            "min_over_time": "val_min",
            "max_over_time": "val_max",
            "sum_over_time": "val_sum_q",
            "count_over_time": "CAST(n AS DOUBLE)",
            "last_over_time": "last_val",
            "changes": "CAST(n_changes AS DOUBLE)",
            "resets": "CAST(n_resets AS DOUBLE)",
            "stdvar_over_time": _VAR_SQL,
            "stddev_over_time": f"sqrt({_VAR_SQL})",
            "quantile_over_time": _quantile_expr_sql("duckdb", quantile),
            "deriv": _linreg_value_sql("deriv"),
            "predict_linear": _linreg_value_sql(
                "predict_linear", offset_s=predict_offset_s
            ),
            "holt_winters": _holt_winters_value_sql("duckdb", hw_sf, hw_tf),
        }[func]
        where_sql = (
            _LINREG_GUARD_SQL
            if func in ("deriv", "predict_linear")
            else "n >= 2"
            if func == "holt_winters"
            else "TRUE"
        )
    elif func == "instant":
        value_sql = "last_val"
        where_sql = "TRUE"
    elif func in ("irate", "idelta"):
        if func == "irate":
            value_sql = (
                "(CASE WHEN last_val < second_last_val THEN last_val "
                "ELSE last_val - second_last_val END) / ((last_ts - second_last_ts) / 1000.0)"
            )
        else:
            value_sql = "last_val - second_last_val"
        where_sql = "n >= 3"
    else:
        corr = " + reset_corr" if is_counter else ""
        diff = f"(last_val - first_val{corr})"
        dd = "CAST(last_ts - first_ts AS DOUBLE)"
        avg_dur = f"({dd} / (n - 1))"
        rts0 = f"CAST(first_ts - (t - {lookback_ms}) AS DOUBLE)"
        if is_counter:
            rts1 = (
                f"(CASE WHEN {diff} > 0 AND first_val >= 0 "
                f"THEN least({rts0}, {dd} * first_val / {diff}) ELSE {rts0} END)"
            )
        else:
            rts1 = rts0
        rts = f"(CASE WHEN {rts1} > {avg_dur} * {EXTRAPOLATION_COEFF} THEN {avg_dur} / 2 ELSE {rts1} END)"
        rte0 = "CAST(t - last_ts AS DOUBLE)"
        rte = f"(CASE WHEN {rte0} > {avg_dur} * {EXTRAPOLATION_COEFF} THEN {avg_dur} / 2 ELSE {rte0} END)"
        value_sql = f"{diff} * ({dd} + {rts} + {rte}) / {dd}"
        if func == "rate":
            value_sql = f"({value_sql}) / {lookback_ms / 1000.0}"
        where_sql = "n >= 2 AND last_ts > first_ts"

    value_out = f"CAST({value_sql} AS DOUBLE)"
    if round_digits is not None:
        # tie-proof floor form, identical to the Spark side's _rounded —
        # CAST(floor(() + 0.5) AS DOUBLE) is tie-unsafe across engines (see similarity._r6)
        scale = 10 ** round_digits
        value_out = (
            f"(CAST(floor({value_out} * CAST({scale} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
            f" / CAST({scale} AS DOUBLE))"
        )
    return f"""{base}
    SELECT {series},
           make_timestamp(t * 1000) AS ts,
           {value_out} AS value
    FROM agg
    WHERE {where_sql}
    """
