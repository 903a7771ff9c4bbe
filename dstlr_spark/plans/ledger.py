"""Resumable execution: per-bucket progress ledger with lineage + metrics.

The reference has job-level overwrite semantics only — an interrupted
run deletes its output directory and restarts from zero
(ExtractTriples.scala:51). The north rule requires checkpointed
per-partition progress so interrupted runs resume exactly.

Design (SURVEY.md §2.9):
- Work is split into deterministic conv-id buckets:
  ``bucket = pmod(xxhash64(conv_id), n_buckets)``. A conversation's
  turns always land in one bucket, so each bucket is independently
  assemble-able.
- Each bucket runs as its own job and writes its triples to
  ``out_dir/bucket=<b>`` with overwrite semantics (idempotent: a
  re-run of a half-written bucket replaces it).
- AFTER the data commit, one ledger row is appended:
  (bucket, n_input_rows, n_triples, wall_sec, finished_ts). The
  data-then-ledger order makes the ledger a conservative watermark —
  a crash between the two re-runs one bucket, never skips one.
- Resume = anti-join pending buckets against the ledger.

At cluster scale ``n_buckets`` is sized so one bucket ≈ one
comfortable job (e.g. 4096 buckets over 10^12 turns); Iceberg snapshot
commits replace the directory-overwrite semantics.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "bucket int, n_input_rows long, input_fingerprint long, n_triples long, "
    "wall_sec double, finished_ts timestamp"
)


def bucket_expr(key: str = "conv_id", n_buckets: int = 16):
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


def read_ledger(spark: SparkSession, ledger_dir: str) -> DataFrame:
    if not Path(ledger_dir).exists():
        return spark.createDataFrame([], LEDGER_SCHEMA)
    return spark.read.schema(LEDGER_SCHEMA).parquet(ledger_dir)


def completed_buckets(spark: SparkSession, ledger_dir: str) -> set[int]:
    return {r["bucket"] for r in read_ledger(spark, ledger_dir).select("bucket").collect()}


def run_with_ledger(
    transcripts: DataFrame,
    out_dir: str,
    ledger_dir: str,
    pipeline_fn: Callable[[DataFrame], DataFrame],
    key: str = "conv_id",
    n_buckets: int = 16,
) -> dict[str, int]:
    """Process every pending bucket; returns {processed, skipped} counts.

    ``pipeline_fn`` maps a transcript chunk to its triple DataFrame.
    Safe to call repeatedly / after a crash: completed buckets are
    skipped, partial buckets are overwritten.
    """
    spark = transcripts.sparkSession
    done = completed_buckets(spark, ledger_dir)
    processed = 0
    bucketed = transcripts.withColumn("_bucket", bucket_expr(key, n_buckets))

    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.perf_counter()
        chunk = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        # lineage: row count + order-independent xor-fold content hash of
        # the bucket's input — a resume after upstream data changed is
        # detectable by comparing fingerprints, and xor-folding is exact
        # under any partitioning/order (north rule: per-partition lineage)
        stats = chunk.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"bit_xor(xxhash64({key}, turn_idx, text))").alias("fp"),
        ).first()
        n_input, fingerprint = stats["n"], stats["fp"]
        triples = pipeline_fn(chunk)
        # triple count via observe on the write itself (X10 machinery) —
        # no second read pass over the bucket just for the ledger metric
        from pyspark.sql import Observation

        obs = Observation(f"ledger-bucket-{b}")
        observed = triples.observe(obs, F.count(F.lit(1)).alias("n_triples"))
        observed.write.mode("overwrite").parquet(f"{out_dir}/bucket={b}")
        n_triples = obs.get["n_triples"]
        wall = time.perf_counter() - t0
        # ledger commit strictly after the data commit (watermark rule)
        spark.createDataFrame(
            [(b, n_input, fingerprint, n_triples, wall, None)], LEDGER_SCHEMA
        ).withColumn("finished_ts", F.current_timestamp()).write.mode(
            "append"
        ).parquet(ledger_dir)
        processed += 1
    return {"processed": processed, "skipped": len(done)}


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read all bucket outputs back as one DataFrame."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/bucket=*")
