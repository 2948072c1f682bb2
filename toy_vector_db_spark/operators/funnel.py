"""Filter-funnel report: ordered gate cascade with per-rule attrition.

Every production data-cleaning pipeline is an ordered list of gates
(language, length, quality score, PII, dedup...), and the number its
operators get judged by is the funnel report: how many documents
reached each rule, how many it dropped, how many survived to the end
(the C4/Gopher/RefinedWeb papers all publish exactly this table).

Spark-first shape: ONE scan. Every rule predicate is evaluated
per-row into a boolean struct (map-side, codegen), the first failing
rule index is derived with ``array_position``, and the whole report is
a single partial-aggregated groupBy over that small integer — shuffle
rows are (rule_idx, count) partials, never documents. Attrition
arithmetic (n_evaluated per rule) is reconstructed from the drop
counts driver-free with a running-sum window over the tiny
(n_rules+1)-row aggregate.

``apply_funnel`` returns the surviving rows themselves (a plain
conjunctive filter — Catalyst folds it into the scan), so report and
filter share rule definitions but neither forces the other's plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _first_fail(rules: Sequence[tuple[str, Column]]) -> Column:
    """0-based index of the first rule the row FAILS; n_rules if the
    row passes everything. Null predicate results count as failures
    (a gate that cannot evaluate a row must not pass it)."""
    passes = F.array(*[F.coalesce(pred, F.lit(False))
                       for _, pred in rules])
    # array_position returns 1-based position of the first false, 0 if
    # none -> map to 0-based fail index / n_rules for survivors
    pos = F.array_position(passes, F.lit(False))
    return F.when(pos == 0, F.lit(len(rules))).otherwise(pos - 1) \
        .cast("int")


def funnel_report(df: DataFrame,
                  rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """(rule_idx, rule, n_evaluated, n_dropped, n_surviving) — one row
    per rule in cascade order. ``n_evaluated`` is the count reaching
    the rule (rows dropped by an earlier rule never reach it, exactly
    like a sequential pipeline), ``n_surviving`` feeds the next rule."""
    if not rules:
        raise ValueError("rules must be non-empty")
    # localCheckpoint: ``drops`` (<= n_rules+1 rows) feeds BOTH the
    # per-rule join and the total — without the cut each branch would
    # re-scan the full table (caught by test_plans)
    drops = (df.select(_first_fail(rules).alias("__fail"))
             .groupBy("__fail").agg(F.count(F.lit(1)).alias("n"))
             .localCheckpoint(eager=True))
    # total + cumulative drops over the <= n_rules+1 row aggregate:
    # the window is tiny by construction (rule count, not data count)
    total = drops.agg(F.sum("n").alias("__total"))
    idx = [(i, name) for i, (name, _) in enumerate(rules)]
    rule_frame = df.sparkSession.createDataFrame(
        idx, "rule_idx int, rule string")
    w = (Window.orderBy("rule_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    joined = (rule_frame
              .join(drops.withColumnRenamed("__fail", "rule_idx"),
                    "rule_idx", "left")
              .withColumn("n_dropped",
                          F.coalesce(F.col("n"), F.lit(0)).cast("bigint"))
              .withColumn("__dropped_before",
                          F.coalesce(F.sum("n_dropped").over(w), F.lit(0)))
              .crossJoin(F.broadcast(total)))
    return (joined.select(
        "rule_idx", "rule",
        (F.col("__total") - F.col("__dropped_before")).cast("bigint")
        .alias("n_evaluated"),
        "n_dropped",
        (F.col("__total") - F.col("__dropped_before") - F.col("n_dropped"))
        .cast("bigint").alias("n_surviving")))


def apply_funnel(df: DataFrame,
                 rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """Rows passing EVERY rule — the pipeline output the report
    describes. A plain conjunctive filter: Catalyst pushes it into the
    scan; no funnel machinery in the plan."""
    if not rules:
        raise ValueError("rules must be non-empty")
    keep = F.lit(True)
    for _, pred in rules:
        keep = keep & F.coalesce(pred, F.lit(False))
    return df.filter(keep)
