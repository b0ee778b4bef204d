"""Dual-dialect expression fragments for the LLM-pipeline operators.

The dedup / similarity / text operators are defined once as expression
templates and rendered into BOTH Spark SQL (executed via ``F.expr``) and
DuckDB SQL (the correctness oracle).  Hash-derived outputs (MinHash
signatures, SimHash, fingerprints) only hash-match across engines if every
arithmetic step is identical, so engine-native hash functions (xxhash64,
duckdb hash) are out; instead we use a portable polynomial rolling hash

    h(s) = fold(chars(s), 0, (acc, c) -> (acc * 131 + c) mod (2^31 - 1))

whose every intermediate fits in int64 in both engines (max acc*131 + c
< 2^31 * 131 + 2^31 < 2^39; MinHash permutations a*h + b < 2^62).
"""

from __future__ import annotations

import re

P = 2147483647  # 2^31 - 1 (Mersenne prime)
BASE = 131

_SQL_KEYWORDS = (
    "ON|WHERE|GROUP|ORDER|LIMIT|UNION|CROSS|JOIN|LEFT|RIGHT|INNER|FULL|HAVING|AND|OR|AS"
)


class Dialect:
    """Engine-specific rendering of shared higher-order primitives."""

    def __init__(self, engine: str):
        assert engine in ("spark", "duckdb")
        self.engine = engine

    # fold with explicit zero seed
    def fold(self, lst: str, var: str, acc: str, body: str) -> str:
        if self.engine == "spark":
            return f"aggregate({lst}, CAST(0 AS BIGINT), ({acc}, {var}) -> {body})"
        return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {lst}), ({acc}, {var}) -> {body})"

    def fold_dbl(self, lst: str, var: str, acc: str, body: str) -> str:
        """Left fold with a DOUBLE 0.0 seed — sequential order on both
        engines, so dyadic-exact addends sum bit-identically."""
        if self.engine == "spark":
            return f"aggregate({lst}, CAST(0.0 AS DOUBLE), ({acc}, {var}) -> {body})"
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {lst}), "
            f"({acc}, {var}) -> {body})"
        )

    def fold_str(self, lst: str, var: str, acc: str, body: str) -> str:
        """Left fold with an empty-STRING seed — for accumulators that
        build a delimited string representation (e.g. BPE merge
        application).  Same sequential-order guarantee as fold()."""
        if self.engine == "spark":
            return f"aggregate({lst}, CAST('' AS STRING), ({acc}, {var}) -> {body})"
        return f"list_reduce(list_prepend('', {lst}), ({acc}, {var}) -> {body})"

    def range1(self, n: str) -> str:
        """[1..n] inclusive; EMPTY for n <= 0 on both engines.

        DuckDB's range(1, n+1) is naturally empty for n <= 0, but Spark's
        sequence(1, 0) yields the DESCENDING list [1, 0] — downstream
        element_at(lst, 0) then throws at runtime (1-token documents hit
        this in the bigram/ratio pipelines).  The CASE guard makes the
        two renderings agree."""
        if self.engine == "spark":
            return f"(CASE WHEN ({n}) >= 1 THEN sequence(1, {n}) ELSE array() END)"
        return f"range(1, ({n}) + 1)"

    def transform(self, lst: str, var: str, body: str) -> str:
        fn = "transform" if self.engine == "spark" else "list_transform"
        return f"{fn}({lst}, {var} -> {body})"

    def filter(self, lst: str, var: str, body: str) -> str:
        fn = "filter" if self.engine == "spark" else "list_filter"
        return f"{fn}({lst}, {var} -> {body})"

    def at(self, lst: str, i: str) -> str:
        if self.engine == "spark":
            return f"element_at({lst}, {i})"
        return f"({lst})[{i}]"

    def size(self, lst: str) -> str:
        return f"size({lst})" if self.engine == "spark" else f"len({lst})"

    def arr_min(self, lst: str) -> str:
        return f"array_min({lst})" if self.engine == "spark" else f"list_min({lst})"

    def arr_max(self, lst: str) -> str:
        return f"array_max({lst})" if self.engine == "spark" else f"list_max({lst})"

    def slice_(self, lst: str, start: str, length: str) -> str:
        """1-based subsequence of ``length`` elements — Spark's slice();
        DuckDB's list_slice takes an inclusive end index."""
        if self.engine == "spark":
            return f"slice({lst}, {start}, {length})"
        return f"list_slice({lst}, {start}, ({start}) + ({length}) - 1)"

    def distinct(self, lst: str) -> str:
        return f"array_distinct({lst})" if self.engine == "spark" else f"list_distinct({lst})"

    def intersect(self, a: str, b: str) -> str:
        fn = "array_intersect" if self.engine == "spark" else "list_intersect"
        return f"{fn}({a}, {b})"

    def contains(self, lst: str, x: str) -> str:
        fn = "array_contains" if self.engine == "spark" else "list_contains"
        return f"{fn}({lst}, {x})"

    def ordered_list(self, val: str, order: str) -> str:
        """Aggregate ``val`` into an array ordered by ``order`` — Spark's
        collect_list order is nondeterministic, so sort structs and strip;
        DuckDB has ORDER BY inside list()."""
        if self.engine == "spark":
            return (
                f"transform(array_sort(collect_list(struct({order} AS o, {val} AS v))), "
                f"s -> s.v)"
            )
        return f"list({val} ORDER BY {order})"

    def explode_range1(self, n: str, alias: str) -> str:
        """A FROM-clause table of 1..n named ``alias`` (one column, same name)."""
        if self.engine == "spark":
            return f"(SELECT explode(sequence(1, {n})) AS {alias})"
        return f"(SELECT unnest(range(1, {n} + 1)) AS {alias})"

    def str_array(self, items: list[str]) -> str:
        quoted = ", ".join(f"'{i}'" for i in items)
        return f"array({quoted})" if self.engine == "spark" else f"[{quoted}]"

    def char_code(self, s: str, j: str) -> str:
        fn = "ascii" if self.engine == "spark" else "ord"
        return f"{fn}(substr({s}, {j}, 1))"

    def shr(self, x: str, j: str) -> str:
        return f"shiftright({x}, {j})" if self.engine == "spark" else f"(({x}) >> ({j}))"

    def shl(self, x: str, j: str) -> str:
        if self.engine == "spark":
            return f"shiftleft(CAST({x} AS BIGINT), {j})"
        return f"(CAST({x} AS BIGINT) << ({j}))"

    def xor(self, a: str, b: str) -> str:
        # NB: ^ is POWER in DuckDB — must use xor().
        return f"({a} ^ {b})" if self.engine == "spark" else f"xor({a}, {b})"

    def regexp_replace_all(self, s: str, pat: str, rep: str) -> str:
        if self.engine == "spark":
            return f"regexp_replace({s}, '{pat}', '{rep}')"
        return f"regexp_replace({s}, '{pat}', '{rep}', 'g')"

    def cte_query(self, ctes: list[tuple[str, str]], final: str) -> str:
        """Compose a query from named stages.

        DuckDB: a plain WITH chain (DuckDB materializes CTEs, so a
        multi-referenced stage is computed once).

        Spark: WITH is rendered as *inlined subqueries* instead.  Empirical
        finding (Spark 4.1, local): wrapping an expensive higher-order-
        function projection in a CTE defeats both cache reuse and projection
        collapse — a one-CTE query over a cached view ran ~20× slower than
        the identical inline-subquery form.  Hot multi-referenced stages
        must additionally be staged as cached temp views by the caller
        (see querybank/llm_ops.py) since inlining duplicates computation.
        """
        if self.engine == "duckdb":
            # AS MATERIALIZED: DuckDB 1.0 still INLINES multi-referenced
            # CTEs by default — an iterative chain (connected components)
            # re-expands the whole prefix 3^k times ("Too many open files"
            # on the parquet scan).  Forcing materialization computes each
            # stage once, matching the staged Spark execution.
            chain = ",\n    ".join(f"{n} AS MATERIALIZED (\n{b}\n    )" for n, b in ctes)
            return f"WITH {chain}\n    {final}"
        resolved: dict[str, str] = {}

        def inline(text: str) -> str:
            for n, b in resolved.items():
                pat = re.compile(
                    rf"\b(FROM|JOIN)\s+{n}\b(?!\s*\()"
                    rf"(\s+(?!(?:{_SQL_KEYWORDS})\b)(?:AS\s+)?([A-Za-z_]\w*))?",
                    re.IGNORECASE,
                )
                text = pat.sub(lambda m: f"{m.group(1)} (\n{b}\n) {m.group(3) or n}", text)
            return text

        for name, body in ctes:
            resolved[name] = inline(body)
        return inline(final)

    def unnest_select(self, cols: str, lst: str, alias: str, src: str) -> str:
        """SELECT cols, <each element of lst> AS alias FROM src."""
        fn = "explode" if self.engine == "spark" else "unnest"
        return f"SELECT {cols}, {fn}({lst}) AS {alias} FROM {src}"

    def unnest_pos_select(
        self, cols: str, lst: str, val: str, pos: str, src: str
    ) -> str:
        """SELECT cols, <element> AS val, <1-based position> AS pos FROM src.
        Spark's posexplode emits a 0-based ordinal — normalized to match
        DuckDB's 1-based generate_subscripts."""
        if self.engine == "spark":
            return (
                f"SELECT {cols}, {val}, {pos} + 1 AS {pos} FROM "
                f"(SELECT {cols}, posexplode({lst}) AS ({pos}, {val}) FROM {src}) pe_"
            )
        return (
            f"SELECT {cols}, unnest({lst}) AS {val}, "
            f"generate_subscripts({lst}, 1) AS {pos} FROM {src}"
        )

    def idiv(self, a: str, b: str) -> str:
        return f"(({a}) div ({b}))" if self.engine == "spark" else f"(({a}) // ({b}))"

    # ---- shared building blocks ----

    def char_fold_hash(self, s: str) -> str:
        """Portable polynomial hash of a string expression."""
        codes = self.transform(self.range1(f"length({s})"), "j", self.char_code(s, "j"))
        return self.fold(codes, "c", "acc", f"(acc * {BASE} + c) % {P}")

    def chunked_hash(self, s: str, chunk: int = 4) -> str:
        """Same polynomial family evaluated ``chunk`` chars per lambda step —
        ~chunk× fewer interpreted higher-order-function invocations than
        char_fold_hash for long strings.  The string is space-padded to a
        chunk multiple (part of the hash definition, identical on both
        engines).  Intermediates: unrolled 4-char horner < 2^31·131³ < 2^53;
        acc·(131⁴ mod P) + chunk_val < 2^31·2^29 + 2^53 < 2^63."""
        assert chunk == 4, "bounds analysis done for chunk=4"
        # NB: `s` must be a CHEAP column reference (pre-project normalization
        # into a CTE first) — it is referenced once per char position.
        mult = pow(BASE, chunk, P)
        horner = "CAST(0 AS BIGINT)"
        for d in range(chunk):
            horner = f"({horner} * {BASE} + {self.char_code(s, f'(j - 1) * {chunk} + {d + 1}')})"
        chunks = self.transform(
            self.range1(self.idiv(f"length({s})", str(chunk))), "j", f"{horner} % {P}"
        )
        return self.fold(chunks, "c", "acc", f"(acc * {mult} + c) % {P}")

    def pad_chunk(self, s: str, chunk: int = 4) -> str:
        """Space-pad ``s`` to a multiple of ``chunk`` chars (pre-projection
        helper for chunked_hash)."""
        n = f"CAST({self.idiv(f'length({s}) + {chunk - 1}', str(chunk))} * {chunk} AS INT)"
        return f"rpad({s}, {n}, ' ')"

    def tokens(self, text: str) -> str:
        """Whitespace tokens; both engines treat ' ' as a literal separator."""
        if self.engine == "spark":
            return f"split({text}, ' ')"
        return f"string_split({text}, ' ')"

    def split_lit(self, text: str, sep: str) -> str:
        """Split on a LITERAL separator.  Spark's split() takes a Java
        regex, so metacharacters must be escaped; DuckDB's string_split is
        literal already."""
        if self.engine == "spark":
            esc = re.sub(r"([.^$*+?()\[\]{}|\\])", r"\\\\\1", sep)
            return f"split({text}, '{esc}')"
        return f"string_split({text}, '{sep}')"

    def shingles(self, tokens: str, k: int = 3) -> str:
        """Token k-grams joined by spaces, [] when fewer than k tokens."""
        n = self.size(tokens)
        parts = " || ' ' || ".join(self.at(tokens, f"i + {d}") for d in range(k))
        body = self.transform(self.range1(f"{n} - {k - 1}"), "i", parts)
        if self.engine == "spark":
            return f"CASE WHEN {n} >= {k} THEN {body} ELSE array() END"
        return f"CASE WHEN {n} >= {k} THEN {body} ELSE [] END"

    def hash_list(self, str_list: str) -> str:
        """Portable hash of every string in a list."""
        return self.transform(str_list, "s", self.char_fold_hash("s"))

    def hash_list_chunked(self, str_list: str) -> str:
        """Portable hash of every string in a list, 4 chars per lambda step.
        Only worth it for LONG strings: the extra pad pass + per-string
        chunk setup made the token-level LSH pipelines ~20% SLOWER
        (tokens average ~5 chars), so tokh_select stays on hash_list;
        use this for lists of paragraph/document-sized strings."""
        padded = self.transform(str_list, "t", self.pad_chunk("t"))
        return self.transform(padded, "s", self.chunked_hash("s"))

    # ---- regex / slicing / rendering helpers (text-pipeline ops) ----

    def rx(self, pat: str) -> str:
        """Regex pattern literal.  Spark SQL string literals process
        C-style escapes (``'\\d'`` → ``d``), so backslashes must be
        doubled; DuckDB strings are raw.  Patterns must stay within the
        Java-regex ∩ RE2 common subset (no lookarounds, no backrefs)."""
        esc = pat.replace("\\", "\\\\") if self.engine == "spark" else pat
        return f"'{esc}'"

    def regexp_extract_all(self, s: str, pat: str) -> str:
        if self.engine == "spark":
            return f"regexp_extract_all({s}, {self.rx(pat)}, 0)"
        return f"regexp_extract_all({s}, {self.rx(pat)})"

    def regexp_scrub(self, s: str, pat: str, rep: str) -> str:
        """Replace ALL matches (escape-safe variant of regexp_replace_all)."""
        if self.engine == "spark":
            return f"regexp_replace({s}, {self.rx(pat)}, '{rep}')"
        return f"regexp_replace({s}, {self.rx(pat)}, '{rep}', 'g')"

    def slice(self, lst: str, start: str, length: str) -> str:
        """1-based, length-bounded sublist (clamped at the end like Spark)."""
        if self.engine == "spark":
            return f"slice({lst}, {start}, {length})"
        return f"({lst})[({start}) : ({start}) + ({length}) - 1]"

    def join_arr(self, lst: str, sep: str) -> str:
        fn = "array_join" if self.engine == "spark" else "array_to_string"
        return f"{fn}({lst}, '{sep}')"

    def cast_str(self, x: str) -> str:
        t = "STRING" if self.engine == "spark" else "VARCHAR"
        return f"CAST({x} AS {t})"

    def epoch_ms(self, ts: str) -> str:
        """Epoch milliseconds of a timestamp column (UTC session on Spark,
        naive-as-UTC on DuckDB — identical values for the testdata)."""
        fn = "unix_millis" if self.engine == "spark" else "epoch_ms"
        return f"{fn}({ts})"


SPARK = Dialect("spark")
DUCK = Dialect("duckdb")
