#!/usr/bin/env python
"""Scale probe for the LATE round-5 additions (BENCH/BASELINE.md
evidence): the eleven operators added after the round-5 seal.

Replicates the sf0.1 tables with distinct keys — documents x K
(200k docs at the default K=40: the sandbox stand-in for a corpus
400x the gate scale), events x K (4M events; user_id key space also
replicated so per-key SCD2 state grows with the corpus, not just
row count), embeddings x K (80k vectors; the Q query anchors stay
FIXED, so the probe measures corpus-scan scaling, which is the 100 TB
axis) — then times each operator end-to-end on local[32].

Results go to BENCH/BASELINE.md by hand, same as probe_burst67.

Usage: python scripts/probe_late5.py [sf_dir] [k] [op ...]
Defaults: /root/testdata/sf0.1, k=40, all ops.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dstlr_spark.session import get_spark


def _stage(spark, sf_dir: str, k: int) -> str:
    staged = tempfile.mkdtemp(prefix="probe_late5_") + "/sf"
    Path(staged).mkdir(parents=True, exist_ok=True)
    reps = spark.range(k).select(F.col("id").alias("rep"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{staged}/documents.parquet")
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(10**12)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(10**9)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{staged}/events.parquet")
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10**9)).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{staged}/embeddings.parquet")
    )

    for t in ("documents", "events", "embeddings"):
        n = spark.read.parquet(f"{staged}/{t}.parquet").count()
        print(f"staged {t}: {n} rows", flush=True)
    return staged


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    only = set(sys.argv[3:])

    spark = get_spark("probe-late5", master="local[32]", shuffle_partitions=64)
    staged = _stage(spark, sf_dir, k)

    from dstlr_spark.queries.conv import q_agent_loops
    from dstlr_spark.queries.curation import q_stratified_sample
    from dstlr_spark.queries.doc_kg import (
        q_allen_relations,
        q_ktruss,
        q_ppr_anchored,
    )
    from dstlr_spark.queries.multimodal import (
        q_audio_vad,
        q_phash_groups,
        q_video_shots,
    )
    from dstlr_spark.queries.relational import q_events_scd2
    from dstlr_spark.queries.similarity import q_hard_negatives
    from dstlr_spark.queries.streamgate import q_stream_scd2

    ops = [
        ("conv_agent_loops", q_agent_loops),
        ("curate_stratified_sample", q_stratified_sample),
        ("kg_ppr_anchored", q_ppr_anchored),
        ("kg_ktruss", q_ktruss),
        ("kg_allen_relations", q_allen_relations),
        ("sim_hard_negatives", q_hard_negatives),
        ("mm_phash_groups", q_phash_groups),
        ("mm_audio_vad", q_audio_vad),
        ("mm_video_shots", q_video_shots),
        ("events_scd2", q_events_scd2),
        ("stream_scd2", q_stream_scd2),
    ]
    for name, fn in ops:
        if only and name not in only:
            continue
        t0 = time.monotonic()
        cnt = fn(spark, staged).count()
        cold = time.monotonic() - t0
        # second invocation in the same session: memoized-stage
        # consumers (the kg_* graph family) now reuse the staged
        # mention/link/edge frames, so warm-vs-cold attributes the
        # shared derivation cost vs the operator's own. Stateful
        # stream drains have no memo to warm — skip the re-run.
        if name.startswith("stream_"):
            print(f"{name:28s} cold {cold:7.1f}s  {cnt} rows", flush=True)
            continue
        t0 = time.monotonic()
        fn(spark, staged).count()
        warm = time.monotonic() - t0
        print(
            f"{name:28s} cold {cold:7.1f}s  warm {warm:7.1f}s  {cnt} rows",
            flush=True,
        )


if __name__ == "__main__":
    main()
