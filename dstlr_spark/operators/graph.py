"""Graph materialize: triple bag → partitioned node/edge tables.

Replaces the reference's Neo4j bulk load (LoadTriples.scala:19-179)
with columnar tables mirroring the same property-graph schema
(SURVEY.md §1.4):

    (:Document)-[:MENTIONS]->(:Mention {class, span, index[]})
    (:Mention)-[:LINKS_TO]->(:Entity)
    (:Mention)-[:SUBJECT_OF]->(:Relation {type, confidence})-[:OBJECT_OF]->(:Mention)
    (:Entity)-[:HAS_FACT]->(:Fact {relation, value})

What Neo4j's MERGE gave the reference — idempotent upsert — we get from
``dropDuplicates`` on node/edge keys + snapshot overwrite; the
serialization hack (``coalesce(1)``, LoadTriples.scala:37, to dodge
MERGE deadlocks) disappears entirely: every table writes in parallel.

The mention ``index`` accumulating list (ON MATCH SET m.index = m.index
+ [i], LoadTriples.scala:67,189-190) becomes a ``collect_list`` over
span labels, sorted for determinism (A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dstlr_spark.functions.text import span_index_label, utf8_truncate_1024


def split_triples(triples: DataFrame) -> dict[str, DataFrame]:
    """F7/F8 routing: the 4-way disjoint split of LoadTriples.scala:39-146."""
    non_fact = triples.where(F.col("objectType") != "Fact")
    return {
        "mentions": non_fact.where(F.col("relation") == "MENTIONS"),
        "links": non_fact.where(
            (F.col("relation") == "LINKS_TO") & F.col("objectValue").isNotNull()
        ),
        "relations": non_fact.where(
            (F.col("relation") != "MENTIONS") & (F.col("relation") != "LINKS_TO")
        ),
        "facts": triples.where(F.col("objectType") == "Fact"),
    }


def materialize_graph(triples: DataFrame) -> dict[str, DataFrame]:
    """Triple bag → {mention_nodes, mentions_edges, links_to, relation_edges,
    fact_edges, entity_nodes} DataFrames (keys deduped = MERGE semantics)."""
    parts = split_triples(triples)

    mentions_edges = parts["mentions"].select(
        F.col("subjectValue").alias("doc_id"),
        F.col("objectValue").alias("mention_id"),
        F.col("meta")["begin"].alias("begin"),
        F.col("meta")["end"].alias("end"),
    )

    # Mention node: id + class/span (first wins, as MERGE ON CREATE) +
    # accumulated sorted index list (A4).
    mention_nodes = (
        parts["mentions"]
        .groupBy(F.col("objectValue").alias("mention_id"))
        .agg(
            F.min_by(
                F.struct(
                    F.col("meta")["entity_class"].alias("entity_class"),
                    F.col("meta")["span"].alias("span"),
                    F.col("meta")["normalized"].alias("normalized"),
                ),
                F.struct(F.col("doc"), F.col("meta")["begin"].alias("b")),
            ).alias("attrs"),
            F.sort_array(
                F.collect_list(
                    span_index_label(F.col("meta")["begin"], F.col("meta")["end"])
                )
            ).alias("index"),
        )
        .select(
            "mention_id",
            F.col("attrs")["entity_class"].alias("entity_class"),
            # C9: the reference caps spans at 1024 BYTES for the Neo4j
            # index (LoadTriples.scala:16-17,55-59); we truncate on a
            # code-point boundary (documented divergence, SURVEY C9)
            utf8_truncate_1024(F.col("attrs")["span"]).alias("span"),
            F.col("attrs")["normalized"].alias("normalized"),
            "index",
        )
    )

    links_to = (
        parts["links"]
        .select(
            F.col("subjectValue").alias("mention_id"),
            F.col("objectValue").alias("entity_id"),
        )
        .dropDuplicates(["mention_id", "entity_id"])
    )

    relation_edges = parts["relations"].select(
        F.col("doc").alias("doc_id"),
        F.col("subjectValue").alias("subject_mention_id"),
        F.col("relation").alias("type"),
        F.col("meta")["confidence"].alias("confidence"),
        F.col("objectValue").alias("object_mention_id"),
    )

    fact_edges = (
        parts["facts"]
        .select(
            F.col("subjectValue").alias("entity_id"),
            F.col("relation"),
            F.col("objectValue").alias("value"),
        )
        .dropDuplicates(["entity_id", "relation", "value"])
    )

    entity_nodes = (
        links_to.select("entity_id")
        .unionByName(fact_edges.select("entity_id"))
        .distinct()
    )

    return {
        "mention_nodes": mention_nodes,
        "mentions_edges": mentions_edges,
        "links_to": links_to,
        "relation_edges": relation_edges,
        "fact_edges": fact_edges,
        "entity_nodes": entity_nodes,
    }


def register_graph_views(spark, graph: dict[str, DataFrame], prefix: str = "") -> None:
    """Expose the graph tables as temp views so the Cypher-analog queries
    can also be written in plain ``spark.sql`` (dual API surface)."""
    for name, df in graph.items():
        df.createOrReplaceTempView(f"{prefix}{name}")


SUPPORTING_SQL = """
SELECT r.doc_id, r.subject_mention_id, r.type AS relation,
       r.object_mention_id, o.span AS object_span,
       l.entity_id, f.value AS fact_value, r.confidence
FROM relation_edges r
JOIN (SELECT DISTINCT doc_id, mention_id FROM mentions_edges) d
  ON d.doc_id = r.doc_id AND d.mention_id = r.subject_mention_id
JOIN mention_nodes o ON o.mention_id = r.object_mention_id
JOIN links_to l ON l.mention_id = r.subject_mention_id
JOIN fact_edges f ON f.entity_id = l.entity_id AND f.relation = r.type
WHERE o.span = f.value
"""


def validate_fk(graph: dict[str, DataFrame]) -> dict[str, int]:
    """J4: orphan-edge checks via left anti joins — the rebuild's analog of
    Neo4j MATCH failing silently (LoadTriples.scala:199,210-211,221)."""
    mention_ids = graph["mention_nodes"].select("mention_id")
    orphans = {
        "links_to_orphans": graph["links_to"]
        .join(mention_ids, "mention_id", "left_anti")
        .count(),
        "relation_subject_orphans": graph["relation_edges"]
        .join(
            mention_ids.withColumnRenamed("mention_id", "subject_mention_id"),
            "subject_mention_id",
            "left_anti",
        )
        .count(),
        "relation_object_orphans": graph["relation_edges"]
        .join(
            mention_ids.withColumnRenamed("mention_id", "object_mention_id"),
            "object_mention_id",
            "left_anti",
        )
        .count(),
    }
    return orphans
