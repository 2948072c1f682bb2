from __future__ import annotations

import datetime as dt

import pytest

from toy_vector_db_spark.operators.journey import (
    event_funnel, funnel_conversion,
)


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes in order
        (1, "view", _ts(1)), (1, "click", _ts(5)), (1, "purchase", _ts(9)),
        # u2: click BEFORE view -> click must not count; no purchase
        (2, "click", _ts(1)), (2, "view", _ts(3)), (2, "click", _ts(7)),
        # u3: view only
        (3, "view", _ts(2)),
        # u4: never views (omitted from funnel)
        (4, "purchase", _ts(1)),
        # u5: click at the SAME second as view -> not strictly later
        (5, "view", _ts(4)), (5, "click", _ts(4)),
    ]
    return spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id long, event_type string, ts timestamp")


def test_strict_ordering_and_progression(events):
    got = {r["user_id"]: r for r in
           event_funnel(events, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["steps_completed"] == 3
    assert got[1]["t2"] - got[1]["t1"] == 4
    # u2's first qualifying click is the one AFTER the view
    assert got[2]["steps_completed"] == 2
    assert got[2]["t2"] - got[2]["t1"] == 4
    assert got[3]["steps_completed"] == 1 and got[3]["t2"] is None
    # same-second click is not strictly later
    assert got[5]["steps_completed"] == 1


def test_conversion_window(events):
    got = {r["user_id"]: r for r in
           event_funnel(events, ["view", "click", "purchase"],
                        within=5).collect()}
    # u1: click at +4 ok, purchase at +8 > 5 -> stops at 2
    assert got[1]["steps_completed"] == 2
    assert got[2]["steps_completed"] == 2  # click at +4 within 5


def test_funnel_conversion_counts(events):
    rows = {r["step"]: r["n_users"] for r in
            funnel_conversion(events,
                              ["view", "click", "purchase"]).collect()}
    assert rows == {"view": 4, "click": 2, "purchase": 1}


def test_validation(events):
    with pytest.raises(ValueError):
        event_funnel(events, ["view"])
    with pytest.raises(ValueError):
        event_funnel(events, ["view", "view"])
