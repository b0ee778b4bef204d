"""PromQL frontend: text → DataFrame plan.

Port of the reference's PromQL support (src/query_frontend/src/promql/):

- grammar subset = what the reference pushes down (pushdown.rs:33-56):
  instant/range selectors, the range functions rate / irate / delta /
  idelta / increase, and the aggregations sum / avg / max / min / count
  with ``by (...)`` / ``without (...)`` (convert.rs:355-368 aggr_op_expr).
  Binary expressions are rejected (convert.rs:346-350 NotSupportedFunc
  behaviour) — parity with the reference, which errors on them too.
- label matchers =, !=, =~, !~ (regex via regex_match udf.rs:50-96);
  the special ``__horaedb_field__`` matcher selects the value field
  (remote.rs / remote-query.py:75-106).
- plan shape (convert.rs:155-353): selector → scan + tag filters →
  PromAlign(range fn | instant) → optional aggregate grouped by
  (timestamp, kept tags) → sort by (series, ts).

Evaluation parameters (start, end, step, lookback default 5 min —
convert.rs:55 DEFAULT_LOOKBACK) come from the query API, like Prometheus's
query_range endpoint.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_horaedb_spark.functions.hashing import regex_match, unique_id
from incubator_horaedb_spark.operators.prom_align import DEFAULT_LOOKBACK_MS, prom_align

FIELD_LABEL = "__horaedb_field__"  # promql/convert.rs field selector label

_RANGE_FNS = ("rate", "irate", "delta", "idelta", "increase")
_AGG_OPS = {"sum": F.sum, "avg": F.avg, "max": F.max, "min": F.min, "count": F.count}
# evaluator-layer aggregation operators (extended grammar only — the
# reference's aggr_op_expr knows just the five above): dispersion via
# exact quantized moments, rank-interpolated quantile over the sorted
# per-group values, and `group` (constant 1 per output series)
_EXT_AGG_NAMES = ("stddev", "stdvar", "quantile", "group")

_DUR_RE = re.compile(r"^(\d+)(ms|s|m|h|d|w)$")
_DUR_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}


def parse_duration_ms(s: str) -> int:
    m = _DUR_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad duration {s!r}")
    return int(m.group(1)) * _DUR_MS[m.group(2)]


@dataclass
class LabelMatcher:
    name: str
    op: str  # = != =~ !~
    value: str


@dataclass
class Selector:
    metric: str
    matchers: list[LabelMatcher] = field(default_factory=list)
    range_ms: int | None = None  # [5m] range selector
    field_name: str | None = None  # via __horaedb_field__
    offset_ms: int = 0  # `offset 1h` modifier (convert.rs Selector.offset)
    # `@ <ts>` modifier (extended grammar): pin the evaluation time — every
    # output step carries the value evaluated at this fixed instant
    at_s: float | None = None  # `@ 1704067200` (epoch seconds)
    # exact epoch-ms for `@` — computed from the TEXT via Decimal at parse
    # time: float(text)*1000 truncates 1704067200.001 to ...000 (the
    # r5-judge-red epoch-ms class; see functions/timeutil.epoch_ms)
    at_ms: int | None = None
    at_ref: str | None = None  # `@ start()` / `@ end()`


@dataclass
class PromQuery:
    selector: Selector
    # rate/irate/delta/idelta/increase, or (extended) any OVER_TIME_FUNCS
    # member or absent_over_time
    range_fn: str | None = None
    # extra positional args of the range function (quantile_over_time's φ,
    # predict_linear's horizon seconds)
    fn_args: tuple[float, ...] = ()
    agg_op: str | None = None
    agg_by: list[str] | None = None  # None → no grouping clause
    agg_without: list[str] | None = None
    agg_param: float | None = None  # quantile(φ, ...)'s φ
    # sort()/sort_desc() (extended grammar): per-step value ordering —
    # surfaced as an explicit `rank` column (row order alone is not part
    # of the comparable result surface)
    sort_dir: str | None = None  # "asc" | "desc"
    # extended evaluator layer (parse_promql(..., extended=True) only):
    # topk | bottomk | clamp | clamp_min | clamp_max | histogram_quantile
    # | count_values — applied AFTER the aggregation stage when both are set
    wrap_fn: str | None = None
    wrap_args: tuple[float, ...] = ()
    wrap_label: str | None = None  # count_values' output label name
    subquery: tuple[str, int, int] | None = None  # (agg fn, window_ms, step_ms)
    # label-set rewriting stages, innermost first: ("replace", dst, repl,
    # src, regex) | ("join", dst, sep, [src, ...]) — functions.go
    # label_replace / label_join; map-side, applied last
    label_ops: list[tuple] = field(default_factory=list)
    # unary math functions (abs/ceil/floor/exp/ln/sqrt), innermost first —
    # outermost layers only (functions.go simpleFunc); map-side
    unary_fns: list[str] = field(default_factory=list)
    # scalar comparison filter: (op, threshold, bool_modifier) — PromQL
    # vector-scalar comparisons drop non-matching samples; with `bool`
    # the value becomes 0/1 instead
    cmp: tuple[str, float, bool] | None = None


@dataclass
class BinExpr:
    """A vector-vector binary expression with explicit matching
    (parse_promql extended=True): lhs op rhs [on(..)/ignoring(..)]
    [group_left].  Division by an exactly-zero right side pins to NULL on
    both engines (the promql_binary_vector_ops convention — safer for
    cross-engine hashing than IEEE Inf)."""

    lhs: "PromQuery | ScalarExpr"
    op: str  # + - * /
    rhs: "PromQuery | ScalarExpr"
    on: list[str] | None = None  # on(): [] ; absent: None
    ignoring: list[str] | None = None
    group_left: bool = False
    group_right: bool = False  # mirror: the "many" side is the RIGHT one
    # labels copied from the "one" side (rhs under group_left, lhs under
    # group_right) onto the output rows
    group_left_labels: list[str] = field(default_factory=list)
    # trailing vector-scalar comparison over this expression's result:
    # (op, threshold, bool_modifier) — rate(a[5m])/rate(b[5m]) > 0.5
    cmp: tuple[str, float, bool] | None = None


@dataclass
class ScalarExpr:
    """A scalar-typed operand/query (extended grammar): a numeric literal,
    ``time()`` (the evaluation timestamp in seconds), or ``scalar(<vector
    expr>)`` (the single sample's value per step — NULL when the inner
    vector does not hold exactly one series at that step, PromQL's NaN
    pinned to NULL for cross-engine hashing).  In a binary expression a
    scalar side applies map-side to every sample of the vector side — no
    join, no matching clause (Prometheus rejects on()/group_* with scalar
    operands, and so does promql_to_df)."""

    kind: str  # "lit" | "time" | "scalar_of"
    value: float = 0.0
    inner: "PromQuery | None" = None


@dataclass
class VectorLit:
    """``vector(<number>)`` (extended grammar): a label-less vector whose
    value is the literal at every evaluation step — the PromQL idiom for
    always-present series (``vector(0)`` fallbacks).  Evaluates to the
    step grid itself, O(steps) rows."""

    value: float


_SELECTOR_RE = re.compile(
    r"^\s*([A-Za-z_:][\w:]*)\s*(\{([^}]*)\})?\s*(\[([\w]+)\])?"
    r"\s*(offset\s+([\w]+))?\s*$",
    re.I,
)
_MATCHER_RE = re.compile(r'\s*([A-Za-z_][\w]*)\s*(=~|!~|!=|=)\s*"((?:[^"\\]|\\.)*)"\s*')


_NUM = r"-?\d+(?:\.\d+)?"
_WRAP_K_RE = re.compile(r"^(topk|bottomk)\s*\(\s*(\d+)\s*,\s*(.*)\)\s*$", re.I | re.S)
_CLAMP_RE = re.compile(
    rf"^clamp\s*\(\s*(.*)\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\)\s*$", re.I | re.S
)
_CLAMP1_RE = re.compile(
    rf"^(clamp_min|clamp_max)\s*\(\s*(.*)\s*,\s*({_NUM})\s*\)\s*$", re.I | re.S
)
_SUBQ_RE = re.compile(
    r"^(max|min|avg|sum)_over_time\s*\(\s*(.*)\s*\[(\w+):(\w+)\]\s*\)\s*$",
    re.I | re.S,
)
_STR = r'"((?:[^"\\]|\\.)*)"'
# direct range functions over a range selector (the full OVER_TIME_FUNCS
# surface of operators/prom_align.py, plus absence detection)
_OVER_TIME_RE = re.compile(
    r"^(avg_over_time|min_over_time|max_over_time|sum_over_time|count_over_time"
    r"|last_over_time|stddev_over_time|stdvar_over_time|changes|resets|deriv"
    r"|absent_over_time)\s*\(\s*(.*)\)\s*$",
    re.I | re.S,
)
_QOT_RE = re.compile(
    rf"^quantile_over_time\s*\(\s*({_NUM})\s*,\s*(.*)\)\s*$", re.I | re.S
)
_PREDICT_RE = re.compile(
    rf"^predict_linear\s*\(\s*(.*)\s*,\s*({_NUM})\s*\)\s*$", re.I | re.S
)
_HISTQ_RE = re.compile(
    rf"^histogram_quantile\s*\(\s*({_NUM})\s*,\s*(.*)\)\s*$", re.I | re.S
)
_COUNT_VALUES_RE = re.compile(
    rf"^count_values\s*\(\s*{_STR}\s*,\s*(.*)\)\s*$", re.I | re.S
)
_LABEL_REPLACE_RE = re.compile(
    rf"^label_replace\s*\(\s*(.*)\s*,\s*{_STR}\s*,\s*{_STR}\s*,\s*{_STR}"
    rf"\s*,\s*{_STR}\s*\)\s*$",
    re.I | re.S,
)
_LABEL_JOIN_RE = re.compile(
    rf"^label_join\s*\(\s*(.*?)\s*,\s*{_STR}\s*,\s*{_STR}((?:\s*,\s*{_STR})+)\s*\)\s*$",
    re.I | re.S,
)
_UNARY_FN_RE = re.compile(
    r"^(abs|ceil|floor|exp|ln|sqrt|sgn|minute|hour|day_of_week|day_of_month"
    r"|days_in_month|month|year|timestamp)\s*\(\s*(.*)\)\s*$",
    re.I | re.S,
)
_HW_RE = re.compile(
    rf"^(?:holt_winters|double_exponential_smoothing)"
    rf"\s*\(\s*(.*)\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\)\s*$",
    re.I | re.S,
)
_SORT_RE = re.compile(r"^(sort|sort_desc)\s*\(\s*(.*)\)\s*$", re.I | re.S)
_CMP_OPS = ("==", "!=", "<=", ">=", "<", ">")
# scalar OP vector ≡ vector FLIP(OP) scalar
_CMP_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "==": "==", "!=": "!="}


def _fold_scalar(e) -> "float | None":
    """Constant-fold a parsed scalar-typed expression (numeric literals
    combined with + - * /); None when it is not a parse-time constant
    (a vector expression, time(), scalar(v), or a zero divisor)."""
    if isinstance(e, ScalarExpr) and e.kind == "lit":
        return e.value
    if isinstance(e, BinExpr):
        l, r = _fold_scalar(e.lhs), _fold_scalar(e.rhs)
        if l is None or r is None:
            return None
        if e.op == "+":
            return l + r
        if e.op == "-":
            return l - r
        if e.op == "*":
            return l * r
        if e.op == "/" and r != 0:
            return l / r
    return None


def _unq(s: str) -> str:
    return s.replace('\\"', '"')


def _find_unquoted_at(q: str) -> int:
    """Position of the first ``@`` outside double-quoted strings, else -1.

    The naive regex peel split quoted label values containing ``@<digits>``
    (``events{user="bob@123"}`` became matcher value ``"bob "`` pinned at
    epoch 123s — silently wrong results).  Metric and label names cannot
    contain ``@``, so any unquoted occurrence is the modifier."""
    in_str = False
    i = 0
    while i < len(q):
        ch = q[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "@":
            return i
        i += 1
    return -1


def _floor_round(col, round_digits):
    """The determinism-critical floor-form rounding, floor(x·s+0.5)/s —
    the ONE definition every evaluation site shares (the gated Spark /
    DuckDB pairs depend on both engines using this exact form); identity
    when round_digits is None."""
    if round_digits is None:
        return col
    scale = float(10**round_digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("double") / F.lit(scale)


def _cmp_filter(df, cmp, val_col="value"):
    """Apply a trailing vector-scalar comparison (op, threshold, bool) to
    the stage's CURRENT value column (`subq_value` after a subquery,
    `n_series` after count_values): drop non-matching samples, or emit
    0/1 with the `bool` modifier."""
    op, thr, as_bool = cmp
    v = F.col(val_col)
    cond = {
        ">": v > thr, "<": v < thr, ">=": v >= thr,
        "<=": v <= thr, "==": v == thr, "!=": v != thr,
    }[op]
    if as_bool:
        return df.withColumn(
            val_col, F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
        )
    return df.filter(cond)


def _as_range_fn(inner: "PromQuery", fn: str, args: tuple) -> "PromQuery":
    """Attach a direct range function (the *_over_time family) to a parsed
    range selector — refuses composition the evaluator cannot express."""
    if inner.range_fn is not None or inner.agg_op is not None:
        raise ValueError(
            f"{fn}() expects a plain range selector, not a nested function"
        )
    if inner.selector.range_ms is None:
        raise ValueError(f"{fn}() requires a range selector, e.g. metric[5m]")
    inner.range_fn = fn
    inner.fn_args = args
    return inner


def _split_top_level_binop(q: str):
    """Split ``lhs op [matching-clause] rhs`` at a top-level arithmetic
    operator, honoring PromQL precedence (+/- bind looser than */) and
    left-associativity (same-precedence chains split at the LAST
    top-level operator, so the left subtree is the bigger one: a-b+c →
    (a-b)+c).  Depth tracking skips quoted matcher values, so operator
    or bracket characters inside label-value strings never split or
    corrupt the depth count.  Returns None when the expression has no
    top-level operator.  The matching clause (on/ignoring +
    group_left[(labels)]) is whatever sits between the operator and the
    first character of the right operand."""
    depth = 0
    in_str = False
    add_ops: list[int] = []  # top-level + - positions
    mul_ops: list[int] = []  # top-level * / positions
    cmp_ops: list[tuple[int, int]] = []  # top-level (pos, len) comparisons
    top_level: list[bool] = []  # per-char: depth 0 and outside strings
    prev_nonspace = ""
    i = 0
    while i < len(q):
        ch = q[i]
        if in_str:
            top_level.append(False)
            if ch == "\\":
                top_level.append(False)
                i += 2
                continue
            if ch == '"':
                in_str = False
            i += 1
            continue
        if ch == '"':
            in_str = True
        elif ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        elif depth == 0 and q[i : i + 2] in ("==", "!=", "<=", ">="):
            cmp_ops.append((i, 2))
            top_level.append(True)
            top_level.append(True)
            prev_nonspace = q[i + 1]
            i += 2
            continue
        elif depth == 0 and ch in "<>":
            cmp_ops.append((i, 1))
        elif (
            depth == 0
            and ch in "+-*/"
            and i > 0
            # a sign directly after another operator (incl. a comparison)
            # is unary, not a binary split point: a > -2
            and prev_nonspace not in "+-*/(<>=!"
        ):
            (add_ops if ch in "+-" else mul_ops).append(i)
        top_level.append(depth == 0 and ch not in "({[")
        if not ch.isspace():
            prev_nonspace = ch
        i += 1
    def _peel(pos: int, op: str, op_len: int):
        lhs = q[:pos].strip()
        if not lhs:
            return None
        rest = q[pos + op_len :].lstrip()
        # peel the optional matching clause token by token
        # group_left(?![\w]) — an identifier merely *starting* with
        # "group_left" (a metric named group_left_total) is an operand,
        # not a matching modifier
        mm = re.match(
            r"^((?:(?:on|ignoring)\s*\([^)]*\)\s*)?"
            r"(?:group_(?:left|right)(?![\w])(?:\s*\([^)]*\))?\s*)?)(.*)$",
            rest,
            re.I | re.S,
        )
        return lhs, op, mm.group(1).strip(), mm.group(2).strip()

    # set operators bind loosest (PromQL precedence: or, then and/unless,
    # then arithmetic); split at the last top-level occurrence
    word_ops = [
        (m.start(), m.group(1).lower(), len(m.group(1)))
        for m in re.finditer(r"\b(or|and|unless)\b", q, re.I)
        if m.start() < len(top_level) and top_level[m.start()]
    ]
    for wanted in (("or",), ("and", "unless")):
        cands = [w for w in word_ops if w[1] in wanted]
        for pos, op, ln in reversed(cands):
            got = _peel(pos, op, ln)
            if got is not None:
                return got

    # comparisons bind looser than arithmetic but tighter than and/or
    # (PromQL precedence); the "matching clause" slot carries the
    # optional `bool` modifier
    for pos, ln in reversed(cmp_ops):
        lhs = q[:pos].strip()
        if not lhs:
            continue
        rest = q[pos + ln :].lstrip()
        mb = re.match(r"^(bool(?![\w]))?\s*(.*)$", rest, re.I | re.S)
        return lhs, q[pos : pos + ln], (mb.group(1) or "").lower(), mb.group(2).strip()

    ops = add_ops or mul_ops  # lowest precedence first; last = left-assoc
    for pos in reversed(ops):
        got = _peel(pos, q[pos], 1)
        if got is not None:
            return got
    return None


def parse_promql(query: str, extended: bool = False, _ext_inner: bool = False) -> PromQuery:
    """Parse PromQL text.

    ``extended=False`` (default) accepts exactly the reference's pushdown
    grammar (pushdown.rs:33-56) and REJECTS everything else — parity with
    the reference, which forwards unsupported functions to an external
    Prometheus evaluator.  ``extended=True`` additionally accepts the
    evaluator-layer functions this engine implements distributed
    (querybank/promql_fns.py): ``topk``/``bottomk``, ``clamp`` /
    ``clamp_min`` / ``clamp_max``, and subqueries
    ``{max,min,avg,sum}_over_time(<range expr>[window:step])`` — the
    subquery step must equal the evaluation step (the inner grid IS the
    subquery grid; promql_to_df enforces it)."""
    q = query.strip()

    if extended:
        if re.match(rf"^{_NUM}$", q):
            return ScalarExpr("lit", value=float(q))
        if re.match(r"^time\s*\(\s*\)$", q, re.I):
            return ScalarExpr("time")
        b = _split_top_level_binop(q)
        if b is not None:
            lhs_txt, op, match_txt, rhs_txt = b
            if op in _CMP_OPS:
                # comparisons bind looser than arithmetic:
                # rate(m[5m]) > 2 * 3 filters at 6, and the scalar side
                # may itself be a folded constant expression
                as_bool = match_txt == "bool"
                lhs_pq = parse_promql(lhs_txt, extended=True)
                rhs_pq = parse_promql(rhs_txt, extended=True)
                lv, rv = _fold_scalar(lhs_pq), _fold_scalar(rhs_pq)
                if rv is not None and lv is None:
                    vec, thr, cop = lhs_pq, rv, op
                elif lv is not None and rv is None:
                    vec, thr, cop = rhs_pq, lv, _CMP_FLIP[op]
                else:
                    raise ValueError(
                        "comparison requires exactly one vector side and one "
                        "constant scalar side (vector-vector and scalar-"
                        "scalar comparisons are not supported)"
                    )
                if not isinstance(vec, (PromQuery, BinExpr)):
                    raise ValueError(
                        "comparison is only supported over a vector expression"
                    )
                if vec.cmp is not None:
                    raise ValueError("chained comparisons are not supported")
                vec.cmp = (cop, thr, as_bool)
                return vec
            on = ignoring = None
            group_left = False
            gl_labels: list[str] = []
            mm = re.match(
                r"^(?:(on|ignoring)\s*\(([^)]*)\)\s*)?"
                r"(group_left|group_right)(?![\w])(?:\s*\(([^)]*)\))?\s*$|"
                r"^(?:(on|ignoring)\s*\(([^)]*)\)\s*)?$",
                match_txt,
                re.I,
            )
            if not mm:
                raise ValueError(f"cannot parse vector matching {match_txt!r}")
            kind, labels_raw = (
                (mm.group(1), mm.group(2)) if mm.group(1) else (mm.group(5), mm.group(6))
            )
            if kind:
                labels = [x.strip() for x in labels_raw.split(",") if x.strip()]
                if kind.lower() == "on":
                    on = labels
                else:
                    ignoring = labels
            group_right = False
            if mm.group(3):
                if mm.group(3).lower() == "group_right":
                    group_right = True
                else:
                    group_left = True
                if mm.group(4):
                    gl_labels = [x.strip() for x in mm.group(4).split(",") if x.strip()]
            if op in ("and", "or", "unless") and (group_left or group_right):
                raise ValueError("grouping modifiers are not allowed with set operators")
            lhs_pq = parse_promql(lhs_txt, extended=True)
            rhs_pq = parse_promql(rhs_txt, extended=True)
            if isinstance(lhs_pq, ScalarExpr) or isinstance(rhs_pq, ScalarExpr):
                if on is not None or ignoring or group_left or group_right:
                    raise ValueError(
                        "vector matching is not allowed with scalar operands"
                    )
                if op in ("and", "or", "unless"):
                    raise ValueError("set operators require vector operands")
            return BinExpr(
                lhs=lhs_pq,
                op=op,
                rhs=rhs_pq,
                on=on,
                ignoring=ignoring,
                group_left=group_left,
                group_right=group_right,
                group_left_labels=gl_labels,
            )
        m = re.match(r"^scalar\s*\(\s*(.*)\)\s*$", q, re.I | re.S)
        if m:
            inner = parse_promql(m.group(1).strip(), extended=True)
            if not isinstance(inner, PromQuery):
                raise ValueError("scalar() expects a vector expression")
            return ScalarExpr("scalar_of", inner=inner)
        m = re.match(rf"^vector\s*\(\s*({_NUM})\s*\)\s*$", q, re.I)
        if m:
            return VectorLit(float(m.group(1)))
        m = _WRAP_K_RE.match(q)
        if m:
            inner = parse_promql(m.group(3).strip(), extended=False, _ext_inner=True)
            inner.wrap_fn = m.group(1).lower()
            inner.wrap_args = (float(m.group(2)),)
            return inner
        m = _CLAMP_RE.match(q)
        if m:
            inner = parse_promql(m.group(1).strip(), extended=False, _ext_inner=True)
            inner.wrap_fn = "clamp"
            inner.wrap_args = (float(m.group(2)), float(m.group(3)))
            return inner
        m = _CLAMP1_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            inner.wrap_fn = m.group(1).lower()
            inner.wrap_args = (float(m.group(3)),)
            return inner
        m = _SUBQ_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            inner.subquery = (
                m.group(1).lower(),
                parse_duration_ms(m.group(3)),
                parse_duration_ms(m.group(4)),
            )
            return inner
        m = _QOT_RE.match(q)
        if m:
            phi = float(m.group(1))
            if not (0.0 <= phi <= 1.0):
                raise ValueError(f"quantile_over_time φ must be in [0, 1], got {phi}")
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            return _as_range_fn(inner, "quantile_over_time", (phi,))
        m = _PREDICT_RE.match(q)
        if m:
            inner = parse_promql(m.group(1).strip(), extended=False, _ext_inner=True)
            return _as_range_fn(inner, "predict_linear", (float(m.group(2)),))
        m = _HW_RE.match(q)
        if m:
            sf_, tf_ = float(m.group(2)), float(m.group(3))
            if not (0.0 < sf_ < 1.0 and 0.0 < tf_ < 1.0):
                raise ValueError(
                    "holt_winters smoothing factors must be in (0, 1)"
                )
            inner = parse_promql(m.group(1).strip(), extended=False, _ext_inner=True)
            return _as_range_fn(inner, "holt_winters", (sf_, tf_))
        m = _SORT_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=True)
            if not isinstance(inner, PromQuery):
                raise ValueError("sort() over a non-vector expression is not supported")
            if inner.sort_dir is not None:
                raise ValueError("nested sort() is not supported")
            inner.sort_dir = "desc" if m.group(1).lower() == "sort_desc" else "asc"
            return inner
        m = _OVER_TIME_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            return _as_range_fn(inner, m.group(1).lower(), ())
        m = _HISTQ_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            inner.wrap_fn = "histogram_quantile"
            inner.wrap_args = (float(m.group(1)),)
            return inner
        m = _COUNT_VALUES_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=False, _ext_inner=True)
            inner.wrap_fn = "count_values"
            inner.wrap_label = _unq(m.group(1))
            return inner
        m = _LABEL_REPLACE_RE.match(q)
        if m:
            inner = parse_promql(m.group(1).strip(), extended=True)
            if not isinstance(inner, PromQuery):
                raise ValueError("label_replace over a binary expression is not supported")
            inner.label_ops.append(
                ("replace", _unq(m.group(2)), _unq(m.group(3)), _unq(m.group(4)), _unq(m.group(5)))
            )
            return inner
        m = _LABEL_JOIN_RE.match(q)
        if m:
            inner = parse_promql(m.group(1).strip(), extended=True)
            if not isinstance(inner, PromQuery):
                raise ValueError("label_join over a binary expression is not supported")
            srcs = [_unq(s) for s in re.findall(_STR, m.group(4))]
            inner.label_ops.append(("join", _unq(m.group(2)), _unq(m.group(3)), srcs))
            return inner
        m = _UNARY_FN_RE.match(q)
        if m:
            inner = parse_promql(m.group(2).strip(), extended=True)
            if not isinstance(inner, PromQuery):
                raise ValueError("unary functions over a binary expression are not supported")
            inner.unary_fns.append(m.group(1).lower())
            return inner

    # aggregation wrapper: op [by/without (labels)] (expr)  |  op (expr) by (labels)
    agg_m = re.match(
        r"^(sum|avg|max|min|count|stddev|stdvar|quantile|group)\s*"
        r"(?:(by|without)\s*\(([^)]*)\)\s*)?"
        r"\((.*?)\)\s*"
        r"(?:(by|without)\s*\(([^)]*)\)\s*)?$",
        q,
        re.I | re.S,
    )
    agg_op = agg_by = agg_without = agg_param = None
    if agg_m:
        agg_op = agg_m.group(1).lower()
        if agg_op in _EXT_AGG_NAMES and not (extended or _ext_inner):
            # aggr_op_expr parity: the reference knows only the five basic
            # aggregation operators (convert.rs:355-368)
            raise ValueError(f"unsupported PromQL aggregation {agg_op!r}")
        clause = agg_m.group(2) or agg_m.group(5)
        labels_raw = agg_m.group(3) if agg_m.group(2) else agg_m.group(6)
        if clause:
            labels = [x.strip() for x in labels_raw.split(",") if x.strip()]
            if clause.lower() == "by":
                agg_by = labels
            else:
                agg_without = labels
        q = agg_m.group(4).strip()
        if agg_op == "quantile":
            pm = re.match(rf"^({_NUM})\s*,\s*(.*)$", q, re.S)
            if not pm:
                raise ValueError("quantile aggregation requires a φ parameter")
            agg_param = float(pm.group(1))
            if not (0.0 <= agg_param <= 1.0):
                # Prometheus warns and returns ±Inf; a clear error is the
                # deterministic rendering here (Inf cannot cross-engine hash)
                raise ValueError(f"quantile φ must be in [0, 1], got {agg_param}")
            q = pm.group(2).strip()

    range_fn = None
    fn_m = re.match(r"^(rate|irate|delta|idelta|increase)\s*\((.*)\)\s*$", q, re.I | re.S)
    if fn_m:
        range_fn = fn_m.group(1).lower()
        q = fn_m.group(2).strip()
    elif re.match(r"^[A-Za-z_:][\w:]*\s*\(", q):
        fname = q.split("(", 1)[0].strip()
        if fname.lower() not in _AGG_OPS:
            # NotSupportedFunc (pushdown.rs:33-56)
            raise ValueError(f"unsupported PromQL function {fname!r}")

    if re.search(r"[+\-*/]\s*[A-Za-z_(\d]", q.split("{")[0]):
        raise ValueError("binary expressions are not supported")  # convert.rs:346-350

    # `@ <ts>` modifier (extended grammar): peel it off the selector text —
    # it may sit before or after `offset`; start()/end() resolve to the
    # evaluation range at compile time (promql_to_df).  The scan is
    # string-aware (quoted label values may contain `@`), and it runs even
    # for the extended=False inner parses the *_over_time wrappers perform
    # (`_ext_inner`) so `avg_over_time(m[2h] @ 1704672000)` works instead of
    # failing with a misleading "cannot parse selector".
    at_s = at_ms_exact = at_ref = None
    at_pos = _find_unquoted_at(q)
    if at_pos >= 0:
        if not (extended or _ext_inner):
            # reference pushdown parity: the modifier is evaluator grammar
            raise ValueError(
                "@ modifier is only supported in the extended grammar"
            )
        rest = q[at_pos + 1 :].lstrip()
        m_at = re.match(
            r"^(\d+(?:\.\d+)?|start\(\s*\)|end\(\s*\))\s*(.*)$", rest, re.S
        )
        if not m_at:
            raise ValueError(f"cannot parse @ modifier at {rest!r}")
        spec = m_at.group(1)
        if spec.startswith("start"):
            at_ref = "start"
        elif spec.startswith("end"):
            at_ref = "end"
        else:
            at_s = float(spec)
            from decimal import Decimal

            at_ms_exact = int(Decimal(spec) * 1000)
        q = (q[:at_pos] + " " + m_at.group(2)).strip()

    sel_m = _SELECTOR_RE.match(q)
    if not sel_m:
        raise ValueError(f"cannot parse selector {q!r}")
    metric = sel_m.group(1)
    matchers = []
    field_name = None
    if sel_m.group(3):
        for mm in _MATCHER_RE.finditer(sel_m.group(3)):
            name, op, value = mm.group(1), mm.group(2), mm.group(3).replace('\\"', '"')
            if name == FIELD_LABEL:
                field_name = value
            else:
                matchers.append(LabelMatcher(name=name, op=op, value=value))
    range_ms = parse_duration_ms(sel_m.group(5)) if sel_m.group(5) else None
    offset_ms = parse_duration_ms(sel_m.group(7)) if sel_m.group(7) else 0
    if range_fn and range_ms is None:
        raise ValueError(f"{range_fn}() requires a range selector, e.g. metric[5m]")

    return PromQuery(
        selector=Selector(
            metric=metric,
            matchers=matchers,
            range_ms=range_ms,
            field_name=field_name,
            offset_ms=offset_ms,
            at_s=at_s,
            at_ms=at_ms_exact,
            at_ref=at_ref,
        ),
        range_fn=range_fn,
        agg_op=agg_op,
        agg_by=agg_by,
        agg_without=agg_without,
        agg_param=agg_param,
    )


def _step_grid(spark, start_ms: int, end_ms: int, step_ms: int) -> DataFrame:
    """The evaluation-step grid as a DataFrame (ts) — O(steps) rows, always
    broadcast-sized regardless of data scale."""
    n_steps = (end_ms - start_ms) // step_ms
    return spark.range(0, n_steps + 1).select(
        F.timestamp_millis(
            (F.lit(start_ms) + F.col("id") * step_ms).cast("long")
        ).alias("ts")
    )


def matcher_to_column(m: LabelMatcher):
    col = F.col(m.name)
    if m.op == "=":
        return col == m.value
    if m.op == "!=":
        return col != m.value
    # Prometheus regex matchers are fully anchored
    return regex_match(col, f"^(?:{m.value})$", negate=(m.op == "!~"))


def promql_to_df(
    query: str | PromQuery,
    tables: dict[str, DataFrame],
    *,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    ts_col: str = "ts",
    tag_cols: list[str] | None = None,
    default_field: str = "value",
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
    extended: bool = False,
    round_digits: int | None = None,
) -> DataFrame:
    """Compile a PromQL query to a DataFrame with columns
    ``(*tags, ts, value)`` (aggregated: ``(*kept_tags, ts, value, uid)``;
    topk/bottomk add ``rn``; subqueries add ``subq_value``).

    The metric name is the table (measurement) name; ``tag_cols`` defaults
    to every string column except the timestamp.  ``round_digits`` rounds
    aligned values with the tie-proof floor form (floor(x·10^d + 0.5)/10^d
    — cross-engine-deterministic, functions/detfloat.py) before any
    evaluator layer, so parser-driven results hash-match the gated
    oracles.  ``extended=True`` enables the evaluator-layer grammar
    (topk/bottomk/clamp*/subqueries) — see parse_promql.
    """
    pq = parse_promql(query, extended=extended) if isinstance(query, str) else query

    if isinstance(pq, (ScalarExpr, VectorLit)):
        # standalone scalar-typed query / vector literal: the step grid
        # itself carries the result — O(steps) rows, no table scan except
        # for scalar_of's inner vector
        spark = next(iter(tables.values())).sparkSession
        grid = _step_grid(spark, start_ms, end_ms, step_ms)
        if isinstance(pq, VectorLit):
            return grid.select("ts", F.lit(pq.value).alias("value")).orderBy("ts")
        if pq.kind == "lit":
            return grid.select("ts", F.lit(pq.value).alias("value")).orderBy("ts")
        if pq.kind == "time":
            val = F.unix_millis("ts").cast("double") / F.lit(1000.0)
            return grid.select("ts", val.alias("value")).orderBy("ts")
        idf = promql_to_df(
            pq.inner, tables, start_ms=start_ms, end_ms=end_ms, step_ms=step_ms,
            ts_col=ts_col, tag_cols=tag_cols, default_field=default_field,
            lookback_ms=lookback_ms, extended=extended, round_digits=round_digits,
        )
        # scalar(v): the single sample's value per step; NULL when the
        # inner vector holds != 1 series (PromQL NaN pinned to NULL)
        sdf = idf.groupBy("ts").agg(
            F.count(F.lit(1)).alias("__n"), F.min("value").alias("__m")
        )
        return (
            grid.join(F.broadcast(sdf), "ts", "left")
            .select(
                "ts", F.when(F.col("__n") == 1, F.col("__m")).alias("value")
            )
            .orderBy("ts")
        )

    if isinstance(pq, BinExpr):
        # vector-vector binary op with explicit matching: evaluate both
        # sides on the SAME grid (one aligned evaluation each), then an
        # equi-join on ts + the matching labels.  At scale both inputs are
        # aligned (series × steps) rows — never raw samples — and an
        # aggregated side is O(steps), broadcast-sized.
        kw = dict(
            tables=tables, start_ms=start_ms, end_ms=end_ms, step_ms=step_ms,
            ts_col=ts_col, tag_cols=tag_cols, default_field=default_field,
            lookback_ms=lookback_ms, extended=extended, round_digits=round_digits,
        )
        lsc = isinstance(pq.lhs, ScalarExpr)
        rsc = isinstance(pq.rhs, ScalarExpr)
        if lsc and rsc:
            raise ValueError(
                "scalar-scalar expressions are not supported; wrap one side "
                "in vector()"
            )
        if lsc or rsc:
            # vector-scalar arithmetic: applied map-side to every sample of
            # the vector side — no join, no shuffle (a scalar_of side adds
            # one broadcast join on the O(steps) per-ts scalar)
            vdf = promql_to_df(pq.rhs if lsc else pq.lhs, **kw)
            sc = pq.lhs if lsc else pq.rhs
            aux = {"ts", "value", "uid", "rn", "subq_value"}
            labels = [c for c in vdf.columns if c not in aux]
            if sc.kind == "lit":
                scol = F.lit(sc.value)
            elif sc.kind == "time":
                scol = F.unix_millis("ts").cast("double") / F.lit(1000.0)
            else:
                idf = promql_to_df(sc.inner, **kw)
                sdf = idf.groupBy("ts").agg(
                    F.count(F.lit(1)).alias("__n"), F.min("value").alias("__m")
                ).select(
                    "ts", F.when(F.col("__n") == 1, F.col("__m")).alias("__s")
                )
                # left join: a step where the inner vector is EMPTY keeps
                # the outer row with a NULL scalar (PromQL NaN pinned to
                # NULL) — same retention as the != 1-series case above
                vdf = vdf.join(F.broadcast(sdf), "ts", "left")
                scol = F.col("__s")
            vl = scol if lsc else F.col("value")
            vr = F.col("value") if lsc else scol
            if pq.op == "/":
                value = F.when(vr != 0, vl / vr)  # zero divisor → NULL
            else:
                value = {"+": vl + vr, "-": vl - vr, "*": vl * vr}[pq.op]
            value = _floor_round(value, round_digits)
            out = vdf.select(*labels, "ts", value.alias("value"))
            if pq.cmp is not None:
                out = _cmp_filter(out, pq.cmp)
            return out.orderBy(*labels, "ts")
        lkw, rkw = dict(kw), dict(kw)
        if pq.group_left_labels and tag_cols is not None:
            # the copied info labels must ride through the "one" side's
            # evaluation as series labels (functionally dependent on the
            # match keys for a well-formed info metric): the rhs under
            # group_left, the lhs under group_right
            side_kw = lkw if pq.group_right else rkw
            side_kw["tag_cols"] = list(tag_cols) + [
                l for l in pq.group_left_labels if l not in tag_cols
            ]
        ldf = promql_to_df(pq.lhs, **lkw)
        rdf = promql_to_df(pq.rhs, **rkw)
        aux = {"ts", "value", "uid", "rn", "subq_value"}
        llabels = [c for c in ldf.columns if c not in aux]
        rlabels = [c for c in rdf.columns if c not in aux]
        if pq.on is not None:
            # an on() label absent from either side is a user error — a
            # silent drop would widen the join to a per-ts cross-match
            # where Prometheus returns no matches.  `or` is exempt: it
            # pads missing labels itself (absent label matches as "").
            missing = [l for l in pq.on if l not in llabels or l not in rlabels]
            if missing and pq.op != "or":
                raise ValueError(
                    f"on({', '.join(pq.on)}): label(s) {missing} not present on "
                    f"both sides (lhs has {llabels}, rhs has {rlabels})"
                )
            keys = ["ts"] + list(pq.on)
        else:
            shared = [l for l in llabels if l in rlabels]
            if pq.ignoring:
                shared = [l for l in shared if l not in pq.ignoring]
            keys = ["ts"] + shared
        if pq.op in ("and", "unless"):
            # set operators (PromQL one-to-one set matching): `and` keeps
            # lhs samples whose (ts, match labels) exist on the right —
            # a semi join; `unless` is the anti join.  Values and labels
            # come from the left side only.
            l = ldf.select(*llabels, "ts", "value")
            r = rdf.select(*[c for c in rlabels if c in keys], "ts")
            how = "left_semi" if pq.op == "and" else "left_anti"
            out = l.join(r, keys, how)
            if pq.cmp is not None:
                out = _cmp_filter(out, pq.cmp)
            return out.orderBy(*llabels, "ts")
        if pq.op == "or":
            # lhs plus the rhs samples with no lhs partner at that
            # (ts, match labels).  Label schemas may differ (the
            # `... or vector(0)` fallback idiom): the union pads missing
            # labels with NULL (PromQL's absent label), and matching
            # compares absent as "" via a NULL-safe signature key —
            # Prometheus matches set operators on the full label set
            # unless on()/ignoring() narrows it
            all_labels = sorted(set(llabels) | set(rlabels))
            if pq.on is not None:
                # an on() label absent from BOTH sides matches trivially
                # ("" == "") — keep only the resolvable keys, matching
                # Prometheus instead of an unresolved-column error
                mkeys = [c for c in pq.on if c in all_labels]
            else:
                mkeys = [
                    c for c in all_labels
                    if not (pq.ignoring and c in pq.ignoring)
                ]
            sig = (
                F.concat_ws(
                    "\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in mkeys]
                )
                if mkeys
                else F.lit("")
            )

            def _pad(df0, have):
                cols = [
                    F.col(c) if c in have
                    else F.lit(None).cast("string").alias(c)
                    for c in all_labels
                ]
                return df0.select(*cols, "ts", "value")

            l = _pad(ldf, llabels).withColumn("__sig", sig)
            extra = _pad(rdf, rlabels).withColumn("__sig", sig).join(
                l.select("ts", "__sig"), ["ts", "__sig"], "left_anti"
            )
            out = l.unionByName(extra).drop("__sig")
            if pq.cmp is not None:
                out = _cmp_filter(out, pq.cmp)
            return out.orderBy(*all_labels, "ts")
        # the "one" side of a grouped match (rhs under group_left, lhs
        # under group_right, rhs in the plain one-to-one case) keeps only
        # its match-key labels + any copied labels; the "many" side keeps
        # its full label set, which becomes the output identity
        one_labels = llabels if pq.group_right else rlabels
        many_labels = rlabels if pq.group_right else llabels
        copy_labels = []
        if pq.group_left_labels:
            mod = "group_right" if pq.group_right else "group_left"
            missing = [l for l in pq.group_left_labels if l not in one_labels]
            if missing:
                raise ValueError(
                    f"{mod}({', '.join(pq.group_left_labels)}): label(s) "
                    f"{missing} not present on the one side ({one_labels})"
                )
            copy_labels = [l for l in pq.group_left_labels if l not in many_labels]
        if pq.group_right:
            l = ldf.select(
                *sorted({c for c in llabels if c in keys} | set(copy_labels)),
                "ts",
                F.col("value").alias("__vl"),
            )
            r = rdf.select(*rlabels, "ts", F.col("value").alias("__vr"))
        else:
            l = ldf.select(*llabels, "ts", F.col("value").alias("__vl"))
            r = rdf.select(
                *sorted({c for c in rlabels if c in keys} | set(copy_labels)),
                "ts",
                F.col("value").alias("__vr"),
            )
        if pq.group_left or pq.group_right:
            # many-to-one requires the "one" side unique per (ts, match
            # keys); a malformed info metric would silently duplicate many-
            # side rows where Prometheus raises a many-to-many matching
            # error.  A count window + conditional raise_error keeps the
            # check lazy (no extra job) and fails loudly at execution.
            mod = "group_left" if pq.group_left else "group_right"
            side = "right" if pq.group_left else "left"
            wcnt = F.count(F.lit(1)).over(Window.partitionBy(*keys))
            err = F.raise_error(
                F.lit(
                    f"{mod}: found duplicate series on the {side} "
                    f"side for match keys {keys}"
                )
            ).cast("double")
            if pq.group_left:
                r = r.withColumn(
                    "__vr", F.when(wcnt > 1, err).otherwise(F.col("__vr"))
                )
            else:
                l = l.withColumn(
                    "__vl", F.when(wcnt > 1, err).otherwise(F.col("__vl"))
                )
        j = l.join(r, keys)
        vl, vr = F.col("__vl"), F.col("__vr")
        if pq.op == "/":
            value = F.when(vr != 0, vl / vr)  # zero divisor → NULL, both engines
        else:
            value = {"+": vl + vr, "-": vl - vr, "*": vl * vr}[pq.op]
        value = _floor_round(value, round_digits)
        out = j.select(*many_labels, *copy_labels, "ts", value.alias("value"))
        if pq.cmp is not None:
            out = _cmp_filter(out, pq.cmp)
        return out.orderBy(*many_labels, *copy_labels, "ts")

    sel = pq.selector
    if sel.metric not in tables:
        raise KeyError(f"unknown metric {sel.metric!r}")
    df = tables[sel.metric]
    tags = tag_cols or [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() == "string" and f.name != ts_col
    ]
    value_col = sel.field_name or default_field

    # Selector::into_scan_plan (convert.rs:562): scan + tag filters
    for m in sel.matchers:
        if m.name not in tags:
            raise ValueError(f"unknown label {m.name!r}")
        df = df.filter(matcher_to_column(m))

    # PromAlign: range function, or Instant alignment for bare selectors
    func = pq.range_fn or "instant"
    lookback = sel.range_ms if pq.range_fn else lookback_ms

    # `@` modifier: pin the evaluation instant — align on the single fixed
    # step, then replicate across the output grid (the grid is O(steps),
    # broadcast-sized at any data scale)
    at_ms = None
    if sel.at_ref == "start":
        at_ms = start_ms
    elif sel.at_ref == "end":
        at_ms = end_ms
    elif sel.at_ms is not None:
        at_ms = sel.at_ms
    elif sel.at_s is not None:
        # programmatic Selector(at_s=...) without the parse-time exact ms
        # (text-parsed queries always carry at_ms): round, don't truncate
        at_ms = int(round(sel.at_s * 1000))
    if at_ms is not None and func == "absent_over_time":
        raise ValueError("@ modifier is not supported with absent_over_time")

    if func == "absent_over_time":
        # 1 for every step whose range window holds no sample of any
        # matching series (functions.go absentOverTime).  The present-step
        # set comes from the same explode-to-grid align plan; the absent
        # set is the step grid anti-joined against it — the grid side is
        # O(steps), so the anti-join broadcasts it at any scale.  Flows
        # into the shared evaluator stage pipeline below (cmp / unary /
        # label ops compose over the absent vector as over any other).
        present = prom_align(
            df, "count_over_time", series_cols=tags, ts_col=ts_col,
            value_col=value_col, start_ms=start_ms, end_ms=end_ms,
            step_ms=step_ms, lookback_ms=lookback, offset_ms=sel.offset_ms,
        ).select("ts").distinct()
        grid = _step_grid(df.sparkSession, start_ms, end_ms, step_ms)
        aligned = grid.join(present, "ts", "left_anti").select(
            "ts", F.lit(1.0).alias("value")
        )
        tags = []  # the absent vector is label-free
    else:
        aligned = prom_align(
            df,
            func,
            series_cols=tags,
            ts_col=ts_col,
            value_col=value_col,
            start_ms=at_ms if at_ms is not None else start_ms,
            end_ms=at_ms if at_ms is not None else end_ms,
            step_ms=step_ms,
            lookback_ms=lookback,
            offset_ms=sel.offset_ms,
            quantile=(pq.fn_args[0] if func == "quantile_over_time" and pq.fn_args else 0.75),
            predict_offset_s=(
                float(pq.fn_args[0]) if func == "predict_linear" and pq.fn_args else None
            ),
            hw_sf=(pq.fn_args[0] if func == "holt_winters" and pq.fn_args else 0.5),
            hw_tf=(
                pq.fn_args[1]
                if func == "holt_winters" and len(pq.fn_args) > 1
                else 0.3
            ),
        )
        if at_ms is not None:
            grid = _step_grid(df.sparkSession, start_ms, end_ms, step_ms)
            aligned = aligned.drop("ts").crossJoin(F.broadcast(grid))

    def _r(col):
        return _floor_round(col, round_digits)

    if round_digits is not None:
        aligned = aligned.withColumn("value", _r(F.col("value")))

    # evaluator stages run OVER the aggregation when both are present
    # (topk(3, sum by (h) (rate(m[5m]))) selects among the aggregated
    # series) — the aggregate narrows the series labels to the kept set
    series_labels = list(tags)
    val_col = "value"  # renamed by the subquery / count_values stages
    keep: list[str] = []
    if pq.agg_op is not None:
        # aggregation grouped by (ts, kept tags) + unique_id projection +
        # sort (convert.rs:270-345)
        if pq.agg_by is not None:
            keep = [t for t in tags if t in pq.agg_by]
        elif pq.agg_without is not None:
            keep = [t for t in tags if t not in pq.agg_without]
        if pq.agg_op in ("stddev", "stdvar"):
            # population dispersion across the group's series per step
            # (functions.go aggregation stddev/stdvar): explicit moments —
            # NOT the engine-native stddev_pop, whose summation order is
            # engine-dependent.  Addends quantized at the 2^-10 grid in
            # determinism mode (squares exact multiples of 2^-20, the
            # stdvar_over_time exactness argument); same greatest(,0)
            # guard as the over-time twins.
            q2 = float(1 << 10)
            qv = (
                F.floor(F.col("value") * F.lit(q2) + F.lit(0.5)).cast("double") / F.lit(q2)
                if round_digits is not None
                else F.col("value")
            )
            g = aligned.groupBy(*keep, "ts").agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum(qv).alias("__s"),
                F.sum(qv * qv).alias("__ss"),
            )
            var = F.greatest(
                F.col("__ss") / F.col("__n")
                - (F.col("__s") / F.col("__n")) * (F.col("__s") / F.col("__n")),
                F.lit(0.0),
            )
            out = var if pq.agg_op == "stdvar" else F.sqrt(var)
            aligned = g.select(*keep, "ts", _r(out).alias("value"))
        elif pq.agg_op == "quantile":
            # rank-interpolated φ-quantile of the group's series values per
            # step (promql quantile()): the same explicit lo + frac·(hi−lo)
            # tree both engines share for quantile_over_time, over the
            # sorted per-group array (group cardinality = series count)
            from incubator_horaedb_spark.operators.prom_align import (
                _quantile_expr_sql,
            )

            phi = pq.agg_param if pq.agg_param is not None else 0.5
            qs = float(1 << 20)
            qv = (
                F.floor(F.col("value") * F.lit(qs) + F.lit(0.5)).cast("double") / F.lit(qs)
                if round_digits is not None
                else F.col("value")
            )
            g = aligned.groupBy(*keep, "ts").agg(
                F.sort_array(F.collect_list(qv)).alias("vals_sorted"),
                F.count(F.lit(1)).alias("n"),
            )
            aligned = g.select(
                *keep,
                "ts",
                _r(F.expr(_quantile_expr_sql("spark", phi))).alias("value"),
            )
        elif pq.agg_op == "group":
            # functions.go `group`: value 1 for every output series
            aligned = aligned.groupBy(*keep, "ts").agg(
                F.min(F.lit(1.0)).alias("value")
            )
        else:
            agg_fn = _AGG_OPS[pq.agg_op]
            agg_in: object = "value"
            if round_digits is not None and pq.agg_op in ("sum", "avg"):
                # determinism mode (the gated-query path): quantize addends to
                # the 2^-26 dyadic grid so the reduction is exact in any order
                # — the promql_sum_by_ts oracle convention; 26 fraction bits
                # keep exactness to ~10^6 series per group at rate magnitudes
                scale = 1 << 26
                agg_in = (
                    F.floor(F.col("value") * F.lit(float(scale)) + F.lit(0.5)).cast("double")
                    / F.lit(float(scale))
                )
            aligned = aligned.groupBy(*keep, "ts").agg(agg_fn(agg_in).alias("value"))
        series_labels = list(keep)

    if pq.subquery is not None:
        # subquery = a range evaluation OVER the aligned range vector; the
        # inner grid IS the subquery grid, so the outer aggregate is a
        # time-RANGE window per series over the aligned output — no second
        # explode, no re-alignment (the promql_subquery_max_rate shape)
        fn, win_ms, sub_step = pq.subquery
        if sub_step != step_ms:
            raise ValueError(
                f"subquery step {sub_step}ms must equal the evaluation step "
                f"{step_ms}ms (the aligned grid is the subquery grid)"
            )
        w = (
            Window.partitionBy(*series_labels)
            .orderBy(F.unix_millis("ts"))
            .rangeBetween(-win_ms, 0)
        )
        outer = {"max": F.max, "min": F.min, "avg": F.avg, "sum": F.sum}[fn]
        aligned = aligned.withColumn("subq_value", outer("value").over(w))
        val_col = "subq_value"  # later stages read the subquery result

    if pq.wrap_fn in ("topk", "bottomk"):
        # per-timestamp series selection (functions.go topk/bottomk): one
        # row_number window partitioned by the grid timestamp; ties break
        # on the series labels identically on both engines
        k = int(pq.wrap_args[0])
        order = F.desc("value") if pq.wrap_fn == "topk" else F.asc("value")
        w = Window.partitionBy("ts").orderBy(order, *[F.col(t) for t in series_labels])
        aligned = aligned.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
    elif pq.wrap_fn == "clamp":
        lo, hi = pq.wrap_args
        aligned = aligned.withColumn(
            "value", F.greatest(F.least(F.col("value"), F.lit(hi)), F.lit(lo))
        )
    elif pq.wrap_fn == "clamp_min":
        aligned = aligned.withColumn(
            "value", F.greatest(F.col("value"), F.lit(pq.wrap_args[0]))
        )
    elif pq.wrap_fn == "clamp_max":
        aligned = aligned.withColumn(
            "value", F.least(F.col("value"), F.lit(pq.wrap_args[0]))
        )
    elif pq.wrap_fn == "histogram_quantile":
        # bucketQuantile (promql/quantile.go): the vector's `le` label
        # carries cumulative bucket counts; per (other labels, ts) pick the
        # first bucket whose cumulative count reaches φ·total and
        # interpolate inside it (first bucket from lower bound 0; a rank in
        # the +Inf bucket clamps to the last finite le).  Two windows over
        # the (series × buckets × steps) aligned rows — never raw samples.
        phi = float(pq.wrap_args[0])
        if "le" not in series_labels:
            raise ValueError("histogram_quantile requires an 'le' label")
        hkeys = [t for t in series_labels if t != "le"]
        inf = float("inf")
        le_num = F.when(
            F.upper(F.col("le")).isin("+INF", "INF"), F.lit(inf)
        ).otherwise(F.col("le").cast("double"))
        wp = Window.partitionBy(*hkeys, "ts")
        wo = wp.orderBy("__le")
        h = (
            aligned.withColumn("__le", le_num)
            .withColumn(
                "__total", F.max(F.when(F.col("__le") == inf, F.col("value"))).over(wp)
            )
            .withColumn(
                "__max_le", F.max(F.when(F.col("__le") != inf, F.col("__le"))).over(wp)
            )
            .withColumn("__prev_cum", F.lag("value").over(wo))
            .withColumn("__prev_le", F.lag("__le").over(wo))
        )
        rank = F.lit(phi) * F.col("__total")
        first_hit = (F.col("value") >= rank) & (
            F.col("__prev_cum").isNull() | (F.col("__prev_cum") < rank)
        )
        lo_le = F.coalesce(F.col("__prev_le"), F.lit(0.0))
        lo_cum = F.coalesce(F.col("__prev_cum"), F.lit(0.0))
        q = F.when(F.col("__le") == inf, F.col("__max_le")).otherwise(
            lo_le
            + (F.col("__le") - lo_le) * (rank - lo_cum) / (F.col("value") - lo_cum)
        )
        aligned = (
            h.filter((F.col("__total") > 0) & first_hit)
            .select(*hkeys, "ts", _r(q).alias("value"))
        )
        series_labels = hkeys
    elif pq.wrap_fn == "count_values":
        # series count per distinct aligned value per timestamp
        # (functions.go count_values); values were floor-rounded above, so
        # grouping keys are engine-stable doubles
        lbl = pq.wrap_label or "value"
        aligned = aligned.groupBy("ts", F.col("value").alias(lbl)).agg(
            F.count(F.lit(1)).alias("n_series")
        )
        series_labels = [lbl]
        val_col = "n_series"  # the vector value IS the series count

    # label-set rewriting last (functions.go label_replace / label_join) —
    # pure map-side string expressions; series identity is never merged
    for op in pq.label_ops:
        if op[0] == "replace":
            _, dst, repl, src, regex = op
            src_col = (
                F.col(src) if src in aligned.columns else F.lit("")
            )
            anchored = f"^(?:{regex})$"
            new_val = F.regexp_replace(src_col, anchored, repl)
            existing = F.col(dst) if dst in aligned.columns else F.lit("")
            aligned = aligned.withColumn(
                dst, F.when(src_col.rlike(anchored), new_val).otherwise(existing)
            )
        else:
            _, dst, sep, srcs = op
            parts = [
                F.coalesce(F.col(s), F.lit("")) if s in aligned.columns else F.lit("")
                for s in srcs
            ]
            aligned = aligned.withColumn(dst, F.concat_ws(sep, *parts))
        if dst not in series_labels:
            series_labels.append(dst)

    # unary math functions, innermost first (functions.go simpleFunc) —
    # pure map-side expressions; ln/sqrt of out-of-domain values pin to
    # NULL on both engines (safer for cross-engine hashing than ±Inf/NaN)
    for fn in pq.unary_fns:
        v = F.col(val_col)
        # calendar functions read the VALUE as epoch seconds (functions.go:
        # `time.Unix(int64(v), 0).UTC()` — truncation toward zero matches
        # floor for the non-negative epoch domain); session timezone is
        # pinned UTC, so the extraction fields match DuckDB's naive reads
        cal = F.timestamp_seconds(F.floor(v).cast("long"))
        expr = {
            "abs": F.abs(v),
            "ceil": F.ceil(v).cast("double"),
            "floor": F.floor(v).cast("double"),
            "exp": F.exp(v),
            "ln": F.when(v > 0, F.log(v)),
            "sqrt": F.when(v >= 0, F.sqrt(v)),
            "sgn": F.signum(v),
            # the sample's own timestamp in seconds (functions.go timestamp)
            "timestamp": F.unix_millis(F.col("ts")).cast("double") / F.lit(1000.0),
            "minute": F.minute(cal).cast("double"),
            "hour": F.hour(cal).cast("double"),
            # Prometheus day_of_week: 0 = Sunday; Spark dayofweek: 1 = Sunday
            "day_of_week": (F.dayofweek(cal) - F.lit(1)).cast("double"),
            "day_of_month": F.dayofmonth(cal).cast("double"),
            "days_in_month": F.dayofmonth(F.last_day(cal)).cast("double"),
            "month": F.month(cal).cast("double"),
            "year": F.year(cal).cast("double"),
        }[fn]
        aligned = aligned.withColumn(val_col, _r(expr))

    if pq.cmp is not None:
        # vector-scalar comparison: drop non-matching samples, or emit
        # 0/1 with the `bool` modifier (PromQL comparison semantics) —
        # applied to the stage chain's CURRENT value column (a filter on
        # a renamed/aggregated-away `value` would silently resolve the
        # PRE-aggregation column through Spark's missing-reference rule)
        aligned = _cmp_filter(aligned, pq.cmp, val_col)

    if pq.sort_dir is not None:
        # sort()/sort_desc(): per-step value ordering surfaced as an
        # explicit rank column (row_number per grid timestamp; ties break
        # on the series labels identically on both engines) — row order
        # alone is not part of the comparable result surface, the rank
        # column is.  One window over the aligned (series × steps) rows.
        order = (
            F.desc(val_col) if pq.sort_dir == "desc" else F.asc(val_col)
        )
        w = Window.partitionBy("ts").orderBy(
            order, *[F.col(t) for t in series_labels]
        )
        return aligned.withColumn("rank", F.row_number().over(w)).orderBy(
            "ts", "rank"
        )

    if pq.agg_op is not None and pq.wrap_fn not in ("histogram_quantile", "count_values"):
        uid = unique_id(keep) if keep else F.lit(0).cast("long")
        return aligned.withColumn("uid", uid).orderBy("uid", "ts")
    return aligned.orderBy(*series_labels, "ts")
