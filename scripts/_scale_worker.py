#!/usr/bin/env python
"""One scaling-bench measurement: run the KG pipeline at a given core
count and print JSON {cpus, docs, triples, sec, triples_per_sec}.

Separate process per measurement so each parallelism level gets a fresh
JVM (no cache/JIT bleed between levels).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dstlr_spark.session import get_spark


def main() -> None:
    cpus = int(sys.argv[1])
    scale_k = int(sys.argv[2])
    sf_dir = sys.argv[3]

    spark = get_spark(
        f"scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16)
    )
    from dstlr_spark.operators.extract import extract_bag_fused
    from dstlr_spark.queries.doc_kg import (
        COOCCUR_WINDOW,
        _aliases,
        _documents,
        _gazetteer,
    )

    docs = _documents(spark, sf_dir)
    if scale_k > 1:
        # Replicate the corpus K× with distinct doc ids: identical input
        # for every parallelism level, sized so compute dominates fixed
        # stage overhead (the sandbox stand-in for a 100 TB corpus).
        reps = spark.range(scale_k).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            F.concat_ws("-", "doc_id", "rep").alias("doc_id"), "contents"
        )
    # materialize input to parquet once (both levels read identical bytes;
    # an in-memory columnar cache anti-scales with concurrency on this VM)
    import tempfile

    staged = tempfile.mkdtemp(prefix=f"scale_docs_{cpus}_") + "/docs"
    # pre-partitioned files: the timed job reads N files in parallel with
    # NO runtime exchange (a runtime .repartition would serialize ~GBs
    # through the single VM disk and poison the scaling measurement)
    docs.repartition(max(cpus * 2, 16)).write.mode("overwrite").parquet(staged)
    docs = spark.read.parquet(staged)
    n_docs = docs.count()

    def run() -> int:
        # the flagship extraction job: one fused Arrow stage, no shuffle
        # (the reference's one-flatMap architecture, ExtractTriples:67-134)
        bag = extract_bag_fused(
            docs, _gazetteer(spark), _aliases(spark),
            cooccur_window=COOCCUR_WINDOW, sent_threshold=10_000,
        )
        return bag.count()

    # Untimed warm-up: whole-stage-codegen JIT compilation is a ~3-4s
    # SERIAL cost in a fresh JVM; on a long-lived cluster it is amortized
    # to zero, so it must not contaminate a scaling measurement.
    run()

    t0 = time.perf_counter()
    n_triples = run()
    sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "triples": n_triples,
                "sec": round(sec, 3),
                "triples_per_sec": round(n_triples / sec, 1),
                "docs_per_sec": round(n_docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
