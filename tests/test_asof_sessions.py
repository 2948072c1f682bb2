from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.asof import asof_join
from toy_vector_db_spark.operators.sessions import session_stats, with_session_ids


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(30), "L2"), (2, _ts(5), "L3")],
        "user_id: long, ts: timestamp, lbl: string")
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(29, 59), 200.0), (1, _ts(31), 300.0),
         (2, _ts(7), 400.0)],
        "user_id: long, ts: timestamp, px: double")
    got = {r["lbl"]: r["px"] for r in
           asof_join(left, right, value_cols=["px"]).collect()}
    assert got == {"L1": 100.0, "L2": 200.0, "L3": None}


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, _ts(10), "L")],
                                 "user_id: long, ts: timestamp, lbl: string")
    right = spark.createDataFrame([(1, _ts(10), 7.0)],
                                  "user_id: long, ts: timestamp, px: double")
    rows = asof_join(left, right, value_cols=["px"],
                     right_ts_as="matched_ts").collect()
    assert rows[0]["px"] == 7.0              # right.ts <= left.ts inclusive
    assert rows[0]["matched_ts"] == _ts(10)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30), "L")],
                                 "user_id: long, ts: timestamp, lbl: string")
    right = spark.createDataFrame([(1, _ts(0), 5.0)],
                                  "user_id: long, ts: timestamp, px: double")
    fresh = asof_join(left, right, value_cols=["px"],
                      tolerance_us=40 * 60 * 1_000_000).first()
    stale = asof_join(left, right, value_cols=["px"],
                      tolerance_us=10 * 60 * 1_000_000).first()
    assert fresh["px"] == 5.0 and stale["px"] is None


def test_asof_collision_raises(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)],
                               "user_id: long, ts: timestamp, v: double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, value_cols=["v"])


def test_session_ids_and_stats(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(50)), (1, _ts(55)),
            (2, _ts(0))]
    ev = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
    s = with_session_ids(ev, gap_minutes=30)
    got = sorted((r["user_id"], r["ts"].minute, r["session_id"])
                 for r in s.collect())
    # user 1: 0,10 in session 1; 50,55 in session 2 (gap 40min > 30)
    assert got == [(1, 0, 1), (1, 10, 1), (1, 50, 2), (1, 55, 2), (2, 0, 1)]
    stats = {r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
             for r in session_stats(ev, gap_minutes=30).collect()}
    assert stats == {1: (2, 4, 2), 2: (1, 1, 1)}


def test_session_gap_boundary_exact_not_new(spark):
    # gap EXACTLY 30min => same session (strict > in the operator)
    ev = spark.createDataFrame([(1, _ts(0)), (1, dt.datetime(2024, 1, 1, 10, 30))],
                               "user_id: long, ts: timestamp")
    rows = with_session_ids(ev, gap_minutes=30).collect()
    assert {r["session_id"] for r in rows} == {1}
