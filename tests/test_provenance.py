"""Invariant pins for the temporal-provenance family (mention→turn
attribution and its consumers).

The attribution interval join is only correct if turn spans PARTITION
the assembled document: every mention offset must land in exactly one
turn. These tests pin that partition property (completeness: nothing
dropped, nothing double-counted) and the internal consistency of the
downstream rollups — properties the value-hash oracle gate cannot
express because they relate MULTIPLE queries to each other.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dstlr_spark.queries.doc_kg import (
    NEG_PER_TRIPLE,
    _documents,
    _gazetteer,
    _linked_entity_pairs,
    _linked_mention_turns,
    q_entity_timeline,
    q_mention_turn_attribution,
    q_negative_samples,
    q_triple_temporal,
)
from dstlr_spark.operators.extract import extract_mentions_native

SF = "/root/testdata/sf0.001"


def test_attribution_partitions_every_mention(spark):
    """Turn spans partition the document: the attribution counts sum to
    EXACTLY the mention-occurrence count — no offset dropped (a gap
    between spans) and none double-attributed (overlapping spans)."""
    attributed = (
        q_mention_turn_attribution(spark, SF)
        .agg(F.sum("n_mentions"))
        .collect()[0][0]
    )
    occurrences = extract_mentions_native(
        _documents(spark, SF), _gazetteer(spark)
    ).count()
    assert attributed == occurrences


def test_timeline_consistent_with_linked_occurrences(spark):
    """Per-entity timeline counts roll up exactly the linked
    occurrences, and every interval is well-formed."""
    linked = _linked_mention_turns(spark, SF)
    tl = q_entity_timeline(spark, SF)
    assert tl.agg(F.sum("n_mentions")).collect()[0][0] == linked.count()
    bad = tl.where(
        (F.col("first_ts_s") > F.col("last_ts_s"))
        | (F.col("n_convs") > F.col("n_mentions"))
        | (F.col("n_convs") < 1)
    )
    assert bad.count() == 0


def test_triple_temporal_rolls_up_all_linked_pairs(spark):
    """Temporal triple observation counts sum to the linked-pair
    count: the span join attributes every subject occurrence."""
    pairs = _linked_entity_pairs(spark, SF).count()
    obs = q_triple_temporal(spark, SF).agg(F.sum("n_obs")).collect()[0][0]
    assert obs == pairs


def test_negative_samples_are_corruptions(spark):
    """Every negative differs from the positive object, shares the
    relation's observed-object universe, and each positive triple gets
    at most NEG_PER_TRIPLE negatives with dense ranks."""
    neg = q_negative_samples(spark, SF).cache()
    try:
        assert neg.where(F.col("neg_obj") == F.col("obj_entity")).count() == 0
        per = neg.groupBy("subj_entity", "relation", "obj_entity").agg(
            F.count(F.lit(1)).alias("n"), F.max("neg_rank").alias("mx")
        )
        assert (
            per.where(
                (F.col("n") > NEG_PER_TRIPLE) | (F.col("mx") != F.col("n"))
            ).count()
            == 0
        )
        # relation-constrained: (relation, neg_obj) must be an observed pair
        ro = (
            _linked_entity_pairs(spark, SF)
            .select(
                F.concat(
                    F.lit("COOCCURS_"), F.col("a_cls"), F.lit("_"), F.col("b_cls")
                ).alias("relation"),
                F.col("obj_entity").alias("neg_obj"),
            )
            .distinct()
        )
        assert neg.select("relation", "neg_obj").join(
            ro, ["relation", "neg_obj"], "left_anti"
        ).count() == 0
    finally:
        neg.unpersist()
