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


def numeric_quantiles(df: DataFrame, columns: list[str],
                      quantiles: list[float] | None = None,
                      group_col: str | None = None,
                      approximate: bool = False) -> DataFrame:
    """(group?, col_name, q, value): exact linear-interpolated
    quantiles per numeric column (optionally per group) — the
    distribution half of the profile (nulls/cardinality/range above;
    spread here). One aggregate; each column's quantile list unpivots
    plan-side via ``inline``.

    ``approximate=True`` swaps exact ``percentile`` (full sort of each
    column's values inside the aggregate — the oracle-able tier) for
    ``approx_percentile`` (bounded-memory sketch, the 100 TB default).
    Nulls are ignored, matching SQL quantile semantics."""
    qs = quantiles or [0.25, 0.5, 0.75, 0.95]
    if not columns:
        raise ValueError("columns must be non-empty")
    if any(not 0 <= q <= 1 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise KeyError(f"no such column(s): {missing}")
    qarr = "array(" + ",".join(f"{q}D" for q in qs) + ")"
    fn = "approx_percentile" if approximate else "percentile"
    aggs = [F.expr(f"{fn}({c}, {qarr})").alias(f"__q{i}")
            for i, c in enumerate(columns)]
    keys = [group_col] if group_col else []
    row = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    structs = ", ".join(
        f"named_struct('col_name', '{c}', 'q', {q}D, "
        f"'value', __q{i}[{j}])"
        for i, c in enumerate(columns) for j, q in enumerate(qs))
    return row.selectExpr(*keys, f"inline(array({structs}))")
