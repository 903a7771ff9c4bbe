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


def test_asof_carries_matched_row_nulls_together(spark):
    """merge_asof parity: the MATCHED right row's values travel together,
    including its NULLs — never backfilled from an older right row."""
    from dstlr_spark.operators.asof import asof_join, asof_join_pandas

    left = spark.createDataFrame(
        [("k", 10), ("k", 30)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, "old", 1.0), ("k", 20, None, 2.0)],
        "key string, ts long, label string, score double",
    )
    got = {
        r["ts"]: (r["asof_label"], r["asof_score"])
        for r in asof_join(left, right, "ts", "key", ["label", "score"]).collect()
    }
    # ts=30 matches the ts=20 right row whose label is NULL: it must stay
    # NULL (not the ts=5 row's "old"), and score must come from the SAME row
    assert got[10] == ("old", 1.0)
    assert got[30] == (None, 2.0)
    # pandas variant agrees
    pg = {
        r["ts"]: (r["asof_label"], r["asof_score"])
        for r in asof_join_pandas(left, right, "ts", "key", ["label", "score"]).collect()
    }
    assert pg == got
