"""Bucketed range join: parity with the naive non-equi join, boundary
semantics, and the no-nested-loop plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from dstlr_spark.operators.rangejoin import range_join_bucketed


def _fixture(spark):
    points = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 10:59:59"),
         (3, "u1", "2024-01-01 11:00:00"),   # == exclusive end of w1
         (4, "u2", "2024-01-01 10:30:00"),
         (5, "u1", "2024-01-03 00:00:00")],  # matches nothing
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    intervals = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 100),
         ("u1", "2024-01-01 10:30:00", "2024-01-01 12:00:00", 101),  # overlaps
         ("u2", "2024-01-01 09:00:00", "2024-01-01 11:00:00", 102)],
        "user_id string, win_start string, win_end string, win_id long",
    ).withColumn("win_start", F.col("win_start").cast("timestamp_ntz")) \
     .withColumn("win_end", F.col("win_end").cast("timestamp_ntz"))
    return points, intervals


def test_range_join_matches_naive_nonequi(spark):
    points, intervals = _fixture(spark)
    bucketed = range_join_bucketed(
        points, intervals, "ts", "win_start", "win_end", key="user_id",
        bucket_width=600,  # narrower than spans: exercises replication
    )
    got = sorted((r["event_id"], r["win_id"]) for r in bucketed.collect())
    naive = points.join(
        intervals,
        (points["user_id"] == intervals["user_id"])
        & (intervals["win_start"] <= points["ts"])
        & (points["ts"] < intervals["win_end"]),
    )
    want = sorted((r["event_id"], r["win_id"]) for r in naive.collect())
    assert got == want
    # boundary semantics: start inclusive, end exclusive, overlap fan-out
    assert (1, 100) in got and (3, 100) not in got and (2, 101) in got
    assert (5, 100) not in got and (5, 101) not in got


def test_range_join_pair_appears_exactly_once(spark):
    """Each (point, interval) pair meets only in the point's own bucket —
    no dedup pass required even when intervals span many buckets."""
    points, intervals = _fixture(spark)
    out = range_join_bucketed(
        points, intervals, "ts", "win_start", "win_end", key="user_id",
        bucket_width=60,  # 90-minute interval → 90 bucket copies
    )
    pairs = [(r["event_id"], r["win_id"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_range_join_plan_has_no_nested_loop(spark):
    from dstlr_spark.queries.relational import q_events_range_join
    from tests.test_plans import _plan

    plan = _plan(spark, q_events_range_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
