"""Approximate distinct-count — the reference's ``thetasketch_distinct``.

Reference: src/df_operator/src/udfs/thetasketch_distinct.rs:63-202 — an
HLL-based mergeable accumulator with target error rate 0.008.  Spark's
``approx_count_distinct`` is HLL++ with an ``rsd`` knob: same semantics
(mergeable partial states, map-side partial aggregation), different sketch
constants, so exact golden values differ — correctness checks must use a
tolerance or an exact-distinct oracle.

At 100 TB this is the right primitive: HLL++ partials merge map-side, so
the shuffle carries one small sketch per group instead of the raw values.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

THETASKETCH_ERROR_RATE = 0.008  # thetasketch_distinct.rs HLL error rate


def thetasketch_distinct(col: Union[Column, str], rsd: float = THETASKETCH_ERROR_RATE) -> Column:
    """Aggregate expression: approximate NDV of ``col``."""
    return F.approx_count_distinct(col, rsd=rsd)
