#!/usr/bin/env python
"""Streaming throughput + scaling probe (north-rule evidence for the
streaming path): drain the stateless turn-triples extraction stream
(`turn_triples_stream` — the continuous KG-construction front half)
over an identical staged turn corpus at two parallelism levels, fresh
JVM each, and report turns/s at both plus scaling efficiency.

The input is staged once as MANY parquet files (file-source streaming
parallelism is file-granular), then each level runs availableNow →
noop sink (no driver-side materialization — throughput measures the
stream, not a memory-sink collect). Each fresh JVM first drains the
identical stream plan once UNTIMED (whole-stage-codegen JIT +
stream-machinery startup are one-time costs a long-lived continuous
deployment amortizes to zero — the same untimed-warm-up methodology
as the batch evidence in scripts/bench_scaling.py), then times a
second full drain from a fresh checkpoint.

Usage: python scripts/probe_streaming.py [sf_dir] [scale_k] [repeats] [lo:hi ...]
Defaults: /root/testdata/sf0.1 40 3 1:4 2:8
Worker mode (internal): --worker <cpus> <staged_dir>
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_FILES = 64  # file-source partitions per micro-batch


def worker(cpus: int, staged_dir: str) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from dstlr_spark.schemas import TRANSCRIPT_SCHEMA
    from dstlr_spark.session import get_spark
    from dstlr_spark.streaming.transcripts_stream import turn_triples_stream

    sys.path.insert(0, str(REPO))
    from dstlr_spark.queries.doc_kg import COOCCUR_WINDOW, DOC_GAZETTEER

    spark = get_spark(
        f"stream-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    n_turns = spark.read.parquet(staged_dir).count()  # untimed warm-up read

    def drain():
        stream = (
            spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", N_FILES)
            .parquet(staged_dir)
        )
        out = turn_triples_stream(stream, DOC_GAZETTEER, COOCCUR_WINDOW)
        ckpt = tempfile.mkdtemp(prefix="dstlr_stream_probe_ckpt_")
        t0 = time.perf_counter()
        q = (
            out.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sec = time.perf_counter() - t0
        rows = sum(int(p["numInputRows"]) for p in q.recentProgress)
        return sec, rows

    drain()  # untimed: JIT-compile the stream plan + start machinery
    sec, rows_in = drain()
    print(
        json.dumps(
            dict(
                cpus=cpus,
                turns=n_turns,
                rows_seen=rows_in,
                sec=round(sec, 3),
                turns_per_sec=round(n_turns / sec, 1),
            )
        )
    )
    spark.stop()


def stage_corpus(sf_dir: str, scale_k: int) -> tuple[str, int]:
    """Derive turns from documents, replicate K×, write as N_FILES
    parquet files — identical bytes for every parallelism level."""
    from pyspark.sql import functions as F

    from dstlr_spark.session import get_spark
    from dstlr_spark.sources.transcripts import derive_transcripts

    spark = get_spark("stream-stage", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    if scale_k > 1:
        reps = spark.range(scale_k).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            F.concat_ws("-", "doc_id", "rep").alias("doc_id"), "text"
        )
    d = tempfile.mkdtemp(prefix="dstlr_stream_probe_corpus_")
    derive_transcripts(docs).repartition(N_FILES).write.mode("overwrite").parquet(d)
    n = spark.read.parquet(d).count()
    spark.stop()
    return d, n


def run_level(cpus: int, staged_dir: str, repeats: int) -> dict:
    best: dict | None = None
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus), staged_dir],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pairs = [
        tuple(int(x) for x in a.split(":")) for a in (sys.argv[4:] or ["1:4", "2:8"])
    ]

    staged, n_turns = stage_corpus(sf_dir, scale_k)
    print(f"staged {n_turns} turns x {N_FILES} files at {staged}", file=sys.stderr)
    for n_lo, n_hi in pairs:
        lo = run_level(n_lo, staged, repeats)
        hi = run_level(n_hi, staged, repeats)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (n_hi / n_lo)
        print(
            json.dumps(
                dict(
                    metric="stream_scaling_efficiency",
                    value=round(eff, 3),
                    unit="ratio",
                    bar=0.8,
                    passed=eff >= 0.8,
                    lo=lo,
                    hi=hi,
                    sf_dir=sf_dir,
                    scale_k=scale_k,
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
