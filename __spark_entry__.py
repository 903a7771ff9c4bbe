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
    """Ship dstlr_spark to Python workers via addPyFile.

    The driver's sys.path patch does not reach worker processes: a
    mapInPandas UDF pickled by reference fails with ModuleNotFoundError
    when the harness runs from a cwd other than the repo root. A
    freshly-zipped copy of the package makes the contract
    location-independent (the spark-submit path uses --py-files, see
    scripts/package.sh).
    """
    if getattr(spark, "_dstlr_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    pkg = Path(__file__).resolve().parent / "dstlr_spark"
    fd, zpath = tempfile.mkstemp(prefix="dstlr_spark_", suffix=".zip")
    import os

    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, f"dstlr_spark/{p.relative_to(pkg)}")
    spark.sparkContext.addPyFile(zpath)
    spark._dstlr_pyfiles_added = True


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
