#!/usr/bin/env python
"""200k-doc scale probe for the round-4 burst-6/7 operators.

Replicates the sf0.1 documents 40x with distinct doc ids (the sandbox
stand-in for a corpus 400x the gate scale) and times each new operator
end-to-end on local[32]. Results go to BENCH/BASELINE.md by hand.

Usage: python scripts/probe_burst67.py [sf_dir] [k]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dstlr_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    spark = get_spark("probe-burst67", master="local[32]", shuffle_partitions=64)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = spark.range(k).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        F.concat_ws("-", "doc_id", "rep").alias("doc_id"),
        "text",
        "lang",
        "n_chars",
    )
    staged = tempfile.mkdtemp(prefix="probe67_") + "/sf"
    Path(staged).mkdir(parents=True, exist_ok=True)
    big.repartition(64).write.mode("overwrite").parquet(f"{staged}/documents.parquet")
    n = spark.read.parquet(f"{staged}/documents.parquet").count()
    print(f"corpus: {n} docs", flush=True)

    from dstlr_spark.queries.doc_kg import (
        q_agreement_by_distance,
        q_blocking_quality,
        q_name_variants,
        q_rule_predictions,
        q_two_hop_reach,
    )
    from dstlr_spark.queries.textstats import q_zipf_fit

    for name, fn in [
        ("text_zipf_fit", q_zipf_fit),
        ("kg_name_variants", q_name_variants),
        ("kg_blocking_quality", q_blocking_quality),
        ("kg_agreement_by_distance", q_agreement_by_distance),
        ("kg_two_hop_reach", q_two_hop_reach),
        ("kg_rule_predictions", q_rule_predictions),
    ]:
        t0 = time.monotonic()
        cnt = fn(spark, staged).count()
        print(f"{name:28s} {time.monotonic() - t0:7.1f}s  {cnt} rows", flush=True)


if __name__ == "__main__":
    main()
