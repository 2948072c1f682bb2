"""Event-sequence funnel: who progressed through A -> B -> C, when.

The product-analytics staple over an events table: for each user, the
earliest time they performed step 1, the earliest step-2 event AFTER
that, the earliest step-3 event after THAT, and so on — strictly
ordered progression, not mere co-occurrence.

Spark-first shape — ONE shuffle total: instead of chaining
``n_steps - 1`` self-joins on user_id (the textbook SQL form, one
shuffle each), observe that earliest-strict-progression is a chain of
conditional minimums — t1 = min step-1 time, t_k = min step-k time
strictly after t_{k-1} — and compute the chain as stacked window
aggregates over ``partitionBy(user)``: one exchange, n window passes
over the same partitioning (no re-shuffle), then a per-user collapse
that reuses the partitioning too. Off-funnel event types are filtered
BEFORE the shuffle, so they never move.

Why windows and not a collect_list fold (the previous shape):
WindowExec buffers each user's rows in a spillable row container,
so a pathological user (a bot with millions of funnel-type events)
degrades to disk; a single ``collect_list`` group cannot spill — the
same per-user history would sit in one aggregation buffer, the
executor-OOM shape.

An optional ``within`` bound (seconds) enforces "completed step k
within T of step 1" — the conversion-window variant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_funnel(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts",
                 within: float | None = None) -> DataFrame:
    """(user, t1..tN as epoch seconds, steps_completed): earliest
    strictly-ordered progression through ``steps`` per user; t_k is
    null once progression stops. Users with no step-1 event are
    omitted. ``within`` (seconds) additionally requires every later
    step to land within that many seconds of t1."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct")
    n = len(steps)
    from pyspark.sql.window import Window
    ev = (events
          .filter(F.col(type_col).isin(*steps))
          .select(F.col(user_col),
                  F.unix_timestamp(F.col(ts_col)).alias("__t"),
                  F.col(type_col).alias("__y")))
    # chained conditional minimums as stacked whole-partition window
    # aggregates: pass k reads pass k-1's column, so Catalyst stacks
    # n Window operators over ONE exchange on the user key. min(when)
    # skips non-matching rows as nulls; strict ">" enforces ordered
    # progression, and a null t_{k-1} nulls t_k (progression stopped).
    w = Window.partitionBy(user_col)
    out = ev
    for k, s in enumerate(steps):
        cond = F.col("__y") == s
        if k > 0:
            cond = cond & (F.col("__t") > F.col(f"__t{k - 1}"))
            if within is not None:
                # float(within), not int(): event epochs are whole
                # seconds but the window itself may be fractional —
                # int() would floor within=0.9 to a 0-second window
                # and silently reject every later step
                cond = cond & (F.col("__t")
                               <= F.col("__t0") + F.lit(float(within)))
        out = out.withColumn(
            f"__t{k}", F.min(F.when(cond, F.col("__t"))).over(w))
    # one row per user; the groupBy reuses the window's partitioning
    # (no second exchange) and min() collapses identical per-row copies
    collapsed = out.groupBy(user_col).agg(
        *[F.min(f"__t{k}").alias(f"t{k + 1}") for k in range(n)])
    reached = sum(F.col(f"t{k + 1}").isNotNull().cast("int")
                  for k in range(n))
    return (collapsed.select(user_col, *[f"t{k + 1}" for k in range(n)],
                             reached.cast("int").alias("steps_completed"))
            .filter(F.col("t1").isNotNull()))


def funnel_conversion(events: DataFrame, steps: Sequence[str],
                      user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      within: float | None = None) -> DataFrame:
    """(step_idx, step, n_users): how many users reached each step —
    the headline conversion table, an n_steps-row aggregate over
    ``event_funnel``."""
    f = event_funnel(events, steps, user_col, type_col, ts_col, within)
    agg = f.agg(*[F.sum((F.col("steps_completed") >= k + 1).cast("bigint"))
                  .alias(f"__s{k}") for k in range(len(steps))])
    pairs = F.array(*[
        F.struct(F.lit(k).alias("step_idx"), F.lit(s).alias("step"),
                 F.coalesce(F.col(f"__s{k}"), F.lit(0)).alias("n_users"))
        for k, s in enumerate(steps)])
    return agg.select(F.inline(pairs))
