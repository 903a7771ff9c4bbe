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
    from dstlr_spark.plans.native_kg import NativeKG
    from dstlr_spark.queries.doc_kg import (
        COOCCUR_WINDOW,
        _aliases,
        _doc_fact_triples,
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
    docs = docs.persist()
    n_docs = docs.count()  # materialize input outside the timed section

    def run() -> int:
        kg = NativeKG(
            docs, _gazetteer(spark), _aliases(spark), _doc_fact_triples(spark),
            cooccur_window=COOCCUR_WINDOW, sent_threshold=10_000,
        )
        n = kg.bag().count()
        kg.unpersist()
        return n

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
