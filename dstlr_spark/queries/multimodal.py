"""Multimodal driver-contract queries: the Arrow header parser checked
against an oracle that re-derives the same metadata WITHOUT parsing
bytes (independent derivations of one spec — see operators/multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dstlr_spark.operators.multimodal import (
    PNG_MAGIC,
    media_metadata,
    sniff_media_type,
    synth_media,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth binary payloads → Arrow header parse → typed metadata."""
    media = synth_media(_docs(spark, sf_dir))
    return media_metadata(media)


def q_media_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native (no-UDF) magic sniffing + byte stats on the binary column."""
    media = synth_media(_docs(spark, sf_dir))
    return media.select(
        "doc_id",
        sniff_media_type(F.col("payload")).alias("media_type"),
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("payload"))).alias("payload_md5"),
    )


_PAYLOAD_SQL = f"""unhex('{PNG_MAGIC}') || unhex('0000000D') || encode('IHDR')
        || unhex(lpad(upper(hex(CAST(n_chars % 512 + 1 AS BIGINT))), 8, '0'))
        || unhex(lpad(upper(hex(CAST((n_chars * 7) % 512 + 1 AS BIGINT))), 8, '0'))
        || encode(text)"""

QUERIES = {
    "mm_media_meta": q_media_meta,
    "mm_media_sniff": q_media_sniff,
}

ORACLES = {
    # independent derivation: dims from the n_chars spec, sizes from text
    "mm_media_meta": f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'image/png' AS media_type,
       CAST(24 + octet_length(encode(text)) AS INT) AS n_bytes,
       md5(upper(hex({_PAYLOAD_SQL}))) AS payload_md5,
       CAST(n_chars % 512 + 1 AS INT) AS width,
       CAST((n_chars * 7) % 512 + 1 AS INT) AS height
FROM documents""",
    "mm_media_sniff": f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       'image/png' AS media_type,
       CAST(24 + octet_length(encode(text)) AS INT) AS n_bytes,
       md5(upper(hex({_PAYLOAD_SQL}))) AS payload_md5
FROM documents""",
}
