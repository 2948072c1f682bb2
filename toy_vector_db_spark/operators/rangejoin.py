"""Interval (range) joins: match rows to [lo, hi) intervals.

Beyond-parity extension (the reference has no joins at all, SURVEY
§2.3). Range predicates are where naive Spark plans go quadratic, so
this module ships both physical strategies and the rule for choosing:

  * ``interval_join`` — non-equi join. With a broadcast-sized interval
    table (band dimensions, calendar windows, SLA tiers) Spark plans
    BroadcastNestedLoopJoin: each executor streams its rows past the
    in-memory intervals. Correct plan at any left-side scale, as long
    as the RIGHT side stays small.
  * ``banded_interval_join`` — the scale path when the interval table
    is too big to broadcast: pick a band width, map each left row to
    bucket floor(point/w), explode each interval to every bucket it
    overlaps, then EQUI-join on the bucket and re-check the residual
    range predicate. The non-equi join becomes a hash join Spark can
    shuffle-partition; cost is the interval duplication factor
    ceil(len/w), which the caller tunes with ``band_width``.

Both return identical rows (tests assert it); workload query
events_value_bands oracle-checks the values against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, point_col: str,
                  lo_col: str = "lo", hi_col: str = "hi",
                  how: str = "inner") -> DataFrame:
    """Join each left row to every right interval with
    lo <= point < hi. Broadcasts the interval side — use only when it
    is dimension-sized."""
    cond = (F.col(point_col) >= F.col(lo_col)) & \
           (F.col(point_col) < F.col(hi_col))
    return left.join(F.broadcast(right), cond, how)


def banded_interval_join(left: DataFrame, right: DataFrame, point_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         band_width: float = 1.0,
                         domain: tuple[float, float] | None = None,
                         max_bands_per_interval: int = 100_000) -> DataFrame:
    """Equi-join rewrite of ``interval_join`` for a LARGE interval
    table: bucketize points, explode intervals across the buckets they
    cover, hash-join on bucket, then apply the exact range predicate.
    Each matching (row, interval) pair meets in exactly one bucket —
    the point's own — so no dedup is needed.

    The rewrite's cost is the duplication factor ceil(len/w) PER
    INTERVAL, so it requires bounded interval lengths: an open-ended
    catch-all band ([50, 1e9) at w=1) would explode to 10^9 rows.
    Pass ``domain=(lo, hi)`` to clamp intervals to the points' value
    domain first (matches outside it are impossible, so clamping is
    lossless); any interval still wider than
    ``max_bands_per_interval`` bands fails fast with a clear error
    instead of an executor OOM. (cap: a fail-fast guard on per-row
    expansion, enforced in-plan — the scale knob is band_width, and
    the guard makes a mis-sized one an error, not an OOM.)"""
    w = float(band_width)
    lb = left.withColumn("__band", F.floor(F.col(point_col) / w))
    lo, hi = F.col(lo_col), F.col(hi_col)
    if domain is not None:
        lo = F.greatest(lo, F.lit(float(domain[0])))
        hi = F.least(hi, F.lit(float(domain[1])))
    # hi is exclusive, so the last covered bucket is ceil(hi/w) - 1
    # (equal to floor(hi/w) unless hi sits exactly on a band edge);
    # empty intervals would make sequence() run backwards — drop them,
    # they can't match anything
    first_b, last_b = F.floor(lo / w), F.ceil(hi / w) - 1
    # the guard is folded INTO the sequence bound (assert_true yields
    # NULL when it passes, raises otherwise) — as a standalone dropped
    # column Catalyst would prune it away and sequence() would
    # materialize the full band array before the error could fire
    guard = F.assert_true(
        last_b - first_b < max_bands_per_interval,
        F.lit(f"interval wider than {max_bands_per_interval} bands; "
              f"raise band_width or clamp with domain="))
    last_checked = last_b + F.coalesce(guard.cast("long"), F.lit(0))
    rb = (right.filter(hi > lo)
          .withColumn("__band", F.explode(F.sequence(first_b, last_checked))))
    out = (lb.join(rb, "__band")
           .filter((F.col(point_col) >= F.col(lo_col))
                   & (F.col(point_col) < F.col(hi_col)))
           .drop("__band"))
    return out
