"""Sessionization (batch): split per-user event streams on inactivity
gaps. Beyond-parity event-analytics operator; the streaming stateful
twin lives in streaming/events.py.

One shuffle (partition by user), two window passes over the sorted
partition — no self-join, no driver loops. Gap arithmetic is integer
microseconds (``unix_micros``) so the DuckDB oracle (``epoch_us``)
matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def with_session_ids(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES,
                     user_col: str = "user_id", ts_col: str = "ts",
                     session_col: str = "session_id") -> DataFrame:
    """Append a per-user session ordinal (1-based): a new session starts
    when the gap to the previous event exceeds ``gap_minutes``."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_us), 1).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy(ts_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(session_col, F.sum(new_session).over(cum))


def session_stats(events: DataFrame, gap_minutes: int = DEFAULT_GAP_MINUTES,
                  user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-user session summary: session count + events per session max."""
    s = with_session_ids(events, gap_minutes, user_col, ts_col)
    per_session = s.groupBy(user_col, "session_id") \
        .agg(F.count("*").alias("n_events"))
    return per_session.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"))
