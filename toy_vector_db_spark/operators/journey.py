"""Event-sequence funnel: who progressed through A -> B -> C, when.

The product-analytics staple over an events table: for each user, the
earliest time they performed step 1, the earliest step-2 event AFTER
that, the earliest step-3 event after THAT, and so on — strictly
ordered progression, not mere co-occurrence.

Spark-first shape — ONE shuffle total: instead of chaining
``n_steps - 1`` self-joins on user_id (the textbook SQL form, one
shuffle each), collect each user's step-relevant events into a sorted
struct array (a single groupBy) and walk the funnel with a per-user
``aggregate`` fold: the accumulator holds the timestamps reached so
far; each event advances the next pending step iff it is strictly
later than the previous step's time. State per user is bounded by the
events the user has for the step types (filtered BEFORE the shuffle,
so off-funnel event types never move).

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
    ev = (events
          .filter(F.col(type_col).isin(*steps))
          .select(F.col(user_col),
                  F.struct(F.unix_timestamp(F.col(ts_col)).alias("t"),
                           F.col(type_col).alias("y")).alias("__e")))
    grouped = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e")).alias("__evs"))

    # fold: acc[k] = epoch of step k+1, -1 while pending. An event of
    # step k+1's type advances iff every earlier step is reached and
    # its time is strictly after acc[k-1] (and inside the window).
    init = F.array_repeat(F.lit(-1).cast("bigint"), n)

    def advance(acc, e):
        out = acc
        for k in range(n):
            prev_ok = F.lit(True) if k == 0 else \
                (F.element_at(acc, k) >= 0) & \
                (e["t"] > F.element_at(acc, k))
            # float(within), not int(): event epochs are whole seconds
            # but the window itself may be fractional — int() would
            # floor within=0.9 to a 0-second window and silently
            # reject every later step
            win_ok = F.lit(True) if (within is None or k == 0) else \
                (e["t"] <= F.element_at(acc, 1) + F.lit(float(within)))
            hit = (F.element_at(acc, k + 1) < 0) & \
                (e["y"] == steps[k]) & prev_ok & win_ok
            out = F.when(hit, F.concat(
                F.slice(acc, 1, k), F.array(e["t"]),
                F.slice(acc, k + 2, n - k - 1))).otherwise(out)
        return out

    walked = grouped.select(
        user_col, F.aggregate("__evs", init, advance).alias("__r"))
    t_cols = [F.when(F.element_at("__r", k + 1) >= 0,
                     F.element_at("__r", k + 1)).alias(f"t{k + 1}")
              for k in range(n)]
    reached = sum((F.element_at("__r", k + 1) >= 0).cast("int")
                  for k in range(n))
    return (walked.select(user_col, *t_cols,
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
