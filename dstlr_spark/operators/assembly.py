"""Document assembly: transcripts → per-conversation documents.

This transform replaces the reference's pass-through document source
(SURVEY.md §1.2): the source of truth is a table of multi-turn
transcripts, and the flat document is *derived* under stable
``(conv_id, turn_idx)`` ordering — the driver's per-row invariant is
per-turn text equality under that ordering.

Scale design:
- One shuffle, on ``conv_id`` (the groupBy key). At 10^12 turns this is
  the big exchange; AQE coalesces/splits post-shuffle partitions.
- Ordering is enforced by ``array_sort`` on ``struct(turn_idx, text)``
  *inside* the aggregation — no global sort, no window, no
  ``orderBy`` (which would be a second exchange + range partitioner).
- Long-conversation skew is handled downstream by salted repartition
  before the extraction UDF (see :func:`salted_repartition`): the
  groupBy itself cannot be salted without a two-phase reassembly, and
  a single conversation's turns always fit one task's memory because
  documents are bounded by the F3 sentence guard anyway; a 1000-turn
  outlier is ~100 KB, not a straggler for the *shuffle* — it is a
  straggler for the *NLP stage*, which is where the salt goes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_documents(transcripts: DataFrame, sep: str = " ") -> DataFrame:
    """``groupBy(conv_id)`` → stable-ordered concat of per-turn text.

    Filters F1/F2 (null/empty conv_id and text,
    ExtractTriples.scala:64-65) are applied here so invalid rows never
    reach the shuffle. Returns ``documents(doc_id, contents)``.
    """
    return (
        transcripts.where(
            F.col("conv_id").isNotNull()
            & (F.col("conv_id") != "")
            & F.col("text").isNotNull()
            & (F.col("text") != "")
        )
        .groupBy(F.col("conv_id").alias("doc_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ).alias("turns")
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform(F.col("turns"), lambda t: t["text"]), sep
            ).alias("contents"),
        )
    )


def assemble_documents_twophase(
    transcripts: DataFrame, sep: str = " ", chunk: int = 1024
) -> DataFrame:
    """Skew-proof assembly: two bounded, order-preserving phases.

    The single-phase ``assemble_documents`` collects ALL of a
    conversation's turns into one aggregation buffer — at 10^12-turn
    scale a pathological 10^6-turn conversation pins one reducer task
    (the long-conversation skew the north rule calls out). Here:

      phase 1: groupBy (conv_id, turn_idx DIV chunk) — every buffer is
               ≤ ``chunk`` turns regardless of conversation length;
      phase 2: groupBy conv_id over the ≤ n/chunk pre-concatenated
               chunk strings.

    Both phases are hash aggregates with bounded state; ordering is
    preserved by sorting on (chunk_idx / turn_idx) INSIDE each
    aggregate, never globally. This is the salting strategy of SURVEY
    §2.8/P1 realized as a two-level combine instead of a random salt —
    deterministic, and the salt key (the chunk index) is meaningful.
    Parity with the single-phase operator is pinned by tests.
    """
    filtered = transcripts.where(
        F.col("conv_id").isNotNull()
        & (F.col("conv_id") != "")
        & F.col("text").isNotNull()
        & (F.col("text") != "")
    )
    phase1 = (
        filtered.groupBy(
            F.col("conv_id"),
            (F.col("turn_idx").cast("long") / chunk).cast("long").alias("chunk_idx"),
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
                    ),
                    lambda t: t["text"],
                ),
                sep,
            ).alias("chunk_text")
        )
    )
    return (
        phase1.groupBy(F.col("conv_id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("chunk_idx"), F.col("chunk_text")))
                    ),
                    lambda t: t["chunk_text"],
                ),
                sep,
            ).alias("contents")
        )
    )


def assemble_documents_grouped(transcripts: DataFrame, sep: str = " ") -> DataFrame:
    """Grouped-map (``applyInPandas``) variant of :func:`assemble_documents`
    (SURVEY.md §2.11): per-conversation pandas DataFrame in, one document
    row out. Semantics identical to the native aggregate (pinned by a
    parity test); this is the slot a custom Python assembly policy
    (e.g. role-aware templating of turns) plugs into — the native
    ``array_sort`` + ``array_join`` path stays the default because it is
    whole-stage-codegen'd and needs no Python workers.
    """
    import pandas as pd

    filtered = transcripts.where(
        F.col("conv_id").isNotNull()
        & (F.col("conv_id") != "")
        & F.col("text").isNotNull()
        & (F.col("text") != "")
    ).select("conv_id", "turn_idx", "text")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "text"], kind="mergesort")
        return pd.DataFrame(
            {"doc_id": [pdf["conv_id"].iloc[0]], "contents": [sep.join(pdf["text"])]}
        )

    return filtered.groupBy("conv_id").applyInPandas(
        assemble, "doc_id string, contents string"
    )


def salted_repartition(df: DataFrame, n: int, key: str = "doc_id", salt_buckets: int = 8) -> DataFrame:
    """Salted repartition before the CPU-heavy extraction stage.

    The reference load-balances with a blunt round-robin
    ``repartition(conf.partitions())`` (ExtractTriples.scala:63). Pure
    round-robin destroys key locality; pure hash(key) lets one huge
    conversation pin a partition. Salting on ``(key, salt)`` keeps
    documents of one conversation co-located *per salt bucket* while
    spreading hot keys across ``salt_buckets`` partitions.

    The salt is derived ONLY from row content (``xxhash64`` over every
    column), never from ``monotonically_increasing_id()`` or ``rand()``:
    a nondeterministic partitioning expression re-deals rows differently
    when a stage retries after a shuffle-fetch failure — the
    SPARK-23207 lost/duplicated-row class — and would break the
    ledger's resume-equals-one-shot guarantee. Content hashing keeps
    retries byte-identical.
    """
    # xxhash64 rejects MapType columns (e.g. a TripleRow meta map) — hash
    # only hashable column types; the salt stays content-derived as long
    # as at least one non-map column exists (all realistic inputs do)
    cols = [
        F.col(f.name) for f in df.schema.fields
        if not f.dataType.typeName().startswith("map")
    ]
    if not cols:
        raise ValueError("salted_repartition needs at least one non-map column")
    return df.repartition(
        n,
        F.col(key),
        F.pmod(F.xxhash64(*cols), F.lit(salt_buckets)),
    )
