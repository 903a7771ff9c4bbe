"""Pathological-scale pin for the bucketed window-pair join.

The naive shape — equi-join on conv_id, band predicate as a post-join
filter — scans O(mentions²) pairs per conversation: one 50k-mention
conversation is 2.5e9 scanned pairs, a guaranteed straggler at corpus
scale. :func:`bucketed_window_pairs` adds the position bucket to the
equi-key, so the same input scans O(mentions · window). This test is
the verdict-r4 "50k mentions in seconds" gate plus exact-count and
parity pins on small inputs.
"""

from __future__ import annotations

import time

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dstlr_spark.queries.doc_kg import bucketed_window_pairs


def _frames(spark, rows, window=8):
    a = spark.createDataFrame(
        [(c, p, f"m{p}") for c, p in rows], "conv_id string, a_pos int, a_id string"
    )
    bm = spark.createDataFrame(
        [(c, p, f"m{p}") for c, p in rows], "conv_id string, b_pos int, b_id string"
    )
    return bucketed_window_pairs(a, bm, window)


def test_exact_pairs_small(spark):
    """Hand-checkable: positions 0..9, window 3 — each a pairs with
    the next min(3, 9-a) positions; bucket boundaries (pos 2→3,
    5→6, 8→9) must not lose cross-bucket pairs."""
    out = _frames(spark, [("c", p) for p in range(10)], window=3).collect()
    got = {(r.a_pos, r.b_pos) for r in out}
    want = {(a, b) for a in range(10) for b in range(a + 1, min(a + 3, 9) + 1)}
    assert got == want
    # each qualifying pair meets EXACTLY once (no dedup needed)
    assert len(out) == len(got)


def test_parity_with_naive_join(spark):
    """Bucketed output == the naive conv-equi-join + band filter on a
    multi-conversation input with gaps and duplicate positions."""
    rows = (
        [("c1", p) for p in [0, 1, 5, 9, 14, 15, 16, 40]]
        + [("c2", p) for p in [3, 3, 4, 100]]
    )
    w = 8
    out = {
        (r.conv_id, r.a_pos, r.b_pos)
        for r in _frames(spark, rows, window=w).collect()
    }
    a = spark.createDataFrame(rows, "conv_id string, a_pos int")
    b = spark.createDataFrame(rows, "conv_id string, b_pos int")
    naive = {
        (r.conv_id, r.a_pos, r.b_pos)
        for r in a.join(b, "conv_id")
        .where((F.col("b_pos") > F.col("a_pos")) & (F.col("b_pos") <= F.col("a_pos") + w))
        .collect()
    }
    assert out == naive


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    positions=st.lists(
        st.tuples(st.sampled_from(["c1", "c2"]), st.integers(0, 60)),
        min_size=1,
        max_size=25,
    ),
    window=st.integers(1, 10),
)
def test_fuzz_parity_with_python_oracle(spark, positions, window):
    """Random (conv, pos) multisets — duplicate positions included —
    vs a pure-Python oracle: every qualifying ordered pair appears
    exactly once, none invented, across bucket boundaries for any
    window. Multiset semantics: k copies of a position pair with j
    qualifying partners contribute k·j rows."""
    want: list[tuple[str, int, int]] = []
    for ca, pa in positions:
        for cb, pb in positions:
            if ca == cb and pa < pb <= pa + window:
                want.append((ca, pa, pb))
    got = [
        (r.conv_id, r.a_pos, r.b_pos)
        for r in _frames(spark, positions, window=window).collect()
    ]
    assert sorted(got) == sorted(want)


def test_50k_mention_conversation_in_seconds(spark):
    """One conversation, 50k mentions, window 8: 399,964 pairs. The
    bucketed join must finish in seconds (the naive shape scans
    2.5e9 pairs here). Generous wall bound — this catches a
    quadratic regression (minutes), not host noise."""
    n, w = 50_000, 8
    m = spark.range(n).select(
        F.lit("big").alias("conv_id"), F.col("id").cast("int").alias("pos")
    ).localCheckpoint()
    a = m.select("conv_id", F.col("pos").alias("a_pos"))
    bm = m.select("conv_id", F.col("pos").alias("b_pos"))
    t0 = time.monotonic()
    cnt = bucketed_window_pairs(a, bm, w).count()
    wall = time.monotonic() - t0
    # sum over a of |(a, a+8]| clipped at n-1 = 8n - (1+..+8)
    assert cnt == w * n - w * (w + 1) // 2
    assert wall < 30, f"bucketed pair join took {wall:.1f}s on 50k mentions"
