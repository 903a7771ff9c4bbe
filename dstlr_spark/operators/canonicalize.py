"""Canonicalization: cross-document entity identity via connected components.

The reference's identity model is *within-document only*: one UUID per
lemma key per doc (ExtractTriples.scala:73,102); cross-document identity
exists only implicitly through Neo4j MERGE on mention ids at load time.
The north rule generalizes this: a ``canonical_id`` per mention cluster,
where mentions are connected when they share an identity signal:

  1. same lemma key (the reference's own coreference-by-lemma rule,
     lifted across documents), or
  2. same resolved link target (two spellings linking to one entity).

Design for 10^12-turn scale:
- Edges are built as **star edges** (member → group-min), one edge per
  member instead of O(group²) pairs — a group of 10^6 mentions of
  "Obama" yields 10^6 edges, not 10^12.
- Components by iterative min-label propagation over the symmetric
  edge set: each round is one shuffle (join) + one aggregate; lineage
  is cut every round with ``localCheckpoint`` (on a cluster: a
  checkpoint dir) so plans don't grow exponentially.
- Convergence: label sets only ever decrease; for star-shaped inputs
  with bridge vertices the diameter is small (≈ alternating-star
  behavior); the loop stops when no label changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_edges(df: DataFrame, id_col: str, group_col: str) -> DataFrame:
    """Group members → (src=member, dst=group minimum). O(n) edges."""
    w_min = df.groupBy(group_col).agg(F.min(id_col).alias("dst"))
    return (
        df.select(F.col(id_col).alias("src"), F.col(group_col).alias("g"))
        .join(w_min.withColumnRenamed(group_col, "g"), "g")
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame | None = None, max_iter: int = 50
) -> DataFrame:
    """``edges(src, dst)`` → ``(id, component)`` with component = min id.

    ``vertices(id)`` optionally adds isolated vertices (own component).
    Deterministic: the component representative is the lexicographic
    minimum member id.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds — min-label propagation needs diameter-many
    rounds, and silently returning a partially merged clustering would
    present non-convergence as a valid result.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts = sym.select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        verts = verts.unionByName(vertices.select(F.col("id"))).distinct()

    labels = verts.select("id", F.col("id").alias("component")).localCheckpoint()
    sym = sym.localCheckpoint()

    changed = -1
    for _ in range(max_iter):
        # neighbour minimum: for each dst, min over its neighbours' labels
        nbr = (
            sym.join(labels, sym["src"] == labels["id"], "inner")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # pointer doubling: follow the label chain one hop
        # (component := label(component)) — min-label alone needs
        # diameter-many rounds; compressing through the current mapping
        # makes chains collapse in O(log diameter) rounds, i.e. fewer
        # shuffles at 10^12 scale. Component values are always vertex
        # ids, so the self-join is total (coalesce is belt-and-braces).
        chain = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("root")
        )
        new_labels = (
            stepped.join(chain, "component", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("root"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); raise max_iter — the graph's "
            "diameter exceeds the round budget"
        )
    return labels


def coref_edges(mentions: DataFrame, links_to: DataFrame | None = None) -> DataFrame:
    """Mention frame (+ optional links) → identity star edges.

    ``mentions`` needs (mention_id, key); ``links_to`` (mention_id,
    entity_id). Signal 1: shared lemma key. Signal 2: shared link target.
    """
    by_key = star_edges(
        mentions.select("mention_id", "key").dropDuplicates(["mention_id"]),
        "mention_id",
        "key",
    )
    if links_to is None:
        return by_key
    by_entity = star_edges(
        links_to.select("mention_id", "entity_id").where(
            F.col("entity_id").isNotNull()
        ),
        "mention_id",
        "entity_id",
    )
    return by_key.unionByName(by_entity).dropDuplicates(["src", "dst"])


def canonicalize_mentions(
    mentions: DataFrame, links_to: DataFrame | None = None
) -> DataFrame:
    """→ (mention_id, canonical_id). Additive: never rewrites the
    reference-shape per-doc ids (SURVEY.md §7 Stage 3 invariant)."""
    edges = coref_edges(mentions, links_to)
    verts = mentions.select(F.col("mention_id").alias("id")).distinct()
    cc = connected_components(edges, verts)
    return cc.select(
        F.col("id").alias("mention_id"), F.col("component").alias("canonical_id")
    )
