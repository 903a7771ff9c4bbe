"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline end-to-end on
sf0.001; ``queries``/``oracle_sql`` expose every implemented operator
from SURVEY.md §2 with DuckDB oracles (see dstlr_spark/queries/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship dstlr_spark to Python workers (see session.ship_package);
    needed here because the driver harness supplies its own session."""
    from dstlr_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline (derive transcripts → assemble → extract
    → link → facts → triple bag) on /root/testdata/sf0.001 documents."""
    _ensure_workers_can_import(spark)
    from pyspark.sql import functions as F

    from dstlr_spark.operators.assembly import assemble_documents
    from dstlr_spark.operators.extract import extract_bag_fused
    from dstlr_spark.queries.doc_kg import (
        COOCCUR_WINDOW,
        _aliases,
        _doc_fact_triples,
        _gazetteer,
    )
    from dstlr_spark.sources.transcripts import derive_transcripts

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    # transcripts → documents (stable-order reassembly), then the fused
    # single-pass extraction (mentions + relations + links, zero shuffles)
    assembled = assemble_documents(derive_transcripts(docs))
    bag = extract_bag_fused(
        assembled, _gazetteer(spark), _aliases(spark), COOCCUR_WINDOW,
        sent_threshold=10_000,
    ).unionByName(_doc_fact_triples(spark))
    return bag


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dstlr_spark.queries import all_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from dstlr_spark.queries import all_oracles

    return all_oracles()
