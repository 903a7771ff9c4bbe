"""As-of join: window strategy ≡ merge_asof strategy; edge semantics."""

from __future__ import annotations

import datetime as dt

from dstlr_spark.operators.asof import asof_join, asof_join_pandas


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00")),
            (2, "u1", _ts("2024-01-01 12:00")),
            (3, "u2", _ts("2024-01-01 09:00")),  # before any right row
            (4, "u2", _ts("2024-01-01 11:00")),  # exactly at a right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30"), 100),
            ("u1", _ts("2024-01-01 11:30"), 101),
            ("u2", _ts("2024-01-01 11:00"), 200),
        ],
        "user_id string, ts timestamp, signup_id long",
    )
    return left, right


EXPECTED = {1: 100, 2: 101, 3: None, 4: 200}


def test_asof_window_strategy(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["asof_signup_id"]
        for r in asof_join(left, right, "ts", "user_id", ["signup_id"]).collect()
    }
    assert got == EXPECTED


def test_asof_strategies_agree(spark):
    left, right = _frames(spark)
    a = sorted(
        (r["event_id"], r["asof_signup_id"])
        for r in asof_join(left, right, "ts", "user_id", ["signup_id"]).collect()
    )
    b = sorted(
        (r["event_id"], r["asof_signup_id"])
        for r in asof_join_pandas(left, right, "ts", "user_id", ["signup_id"]).collect()
    )
    assert a == b
