"""X10/A5: metrics via DataFrame observe (no second pass)."""

from __future__ import annotations

from dstlr_spark.plans.pipeline import build_triples, observe_metrics
from dstlr_spark.sources.fixtures import alias_dict, facts, property_relation
from dstlr_spark.sources.transcripts import generate_transcripts


def test_observe_counts_triples_and_docs(spark):
    tr = generate_transcripts(spark, n_convs=4)
    triples = build_triples(
        tr, alias_dict(spark), facts(spark), property_relation(spark)
    )
    observed, obs = observe_metrics(triples, "m1")
    n = observed.count()
    row = obs.get
    assert row["triples"] == n
    # approx sketch: allow slack around convs + smokes + ground-truth
    assert 0 < row["docs"] <= 2 * (4 + 5 + 1)
