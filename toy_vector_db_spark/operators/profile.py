"""Table profiling: per-column data-quality statistics in one pass.

The ANALYZE/profile step every large-scale ingest runs before
training: null rates, cardinalities, and value ranges per column,
computed as ONE aggregate over the table (map-side partial aggregation
does almost all the work; the shuffle carries a single row of partial
states per partition). The wide one-row result is unpivoted to a long
(col_name, metric...) layout with ``stack`` — still plan-side, no
driver reshaping.

``approximate=True`` swaps exact COUNT(DISTINCT) (one expand pass per
column — exact, value-oracle-able, heavier) for HyperLogLog++
``approx_count_distinct`` (single pass, constant memory) — the 100 TB
default; the exact tier exists because the driver oracle hash-checks
it (workload.profile_orders).

min/max are computed on the NATIVE type (numeric min, not string min)
and cast to string afterwards, so the long layout holds mixed column
types without lying about ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approximate: bool = False) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_value, max_value) — one row
    per profiled column. NULLs are excluded from n_distinct (both
    engines' COUNT(DISTINCT) semantics)."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise KeyError(f"no such column(s): {missing}")
    aggs = []
    for i, c in enumerate(cols):
        distinct = (F.approx_count_distinct(c) if approximate
                    else F.countDistinct(c))
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n{i}"),
            distinct.cast("long").alias(f"__d{i}"),
            F.min(F.col(c)).cast("string").alias(f"__lo{i}"),
            F.max(F.col(c)).cast("string").alias(f"__hi{i}"),
        ]
    row = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __n{i}, __d{i}, __lo{i}, __hi{i}"
        for i, c in enumerate(cols))
    return row.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)")
