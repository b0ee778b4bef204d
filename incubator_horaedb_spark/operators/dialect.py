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

P = 2147483647  # 2^31 - 1 (Mersenne prime)
BASE = 131


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

    def range1(self, n: str) -> str:
        """[1..n] inclusive."""
        if self.engine == "spark":
            return f"sequence(1, {n})"
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

    def distinct(self, lst: str) -> str:
        return f"array_distinct({lst})" if self.engine == "spark" else f"list_distinct({lst})"

    def intersect(self, a: str, b: str) -> str:
        fn = "array_intersect" if self.engine == "spark" else "list_intersect"
        return f"{fn}({a}, {b})"

    def contains(self, lst: str, x: str) -> str:
        fn = "array_contains" if self.engine == "spark" else "list_contains"
        return f"{fn}({lst}, {x})"

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

    # ---- shared building blocks ----

    def char_fold_hash(self, s: str) -> str:
        """Portable polynomial hash of a string expression."""
        codes = self.transform(self.range1(f"length({s})"), "j", self.char_code(s, "j"))
        return self.fold(codes, "c", "acc", f"(acc * {BASE} + c) % {P}")

    def tokens(self, text: str) -> str:
        """Whitespace tokens; both engines treat ' ' as a literal separator."""
        if self.engine == "spark":
            return f"split({text}, ' ')"
        return f"string_split({text}, ' ')"

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


SPARK = Dialect("spark")
DUCK = Dialect("duckdb")
