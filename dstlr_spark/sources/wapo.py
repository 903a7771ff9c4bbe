"""WaPo-style JSONL document source — the S3 analog, HTML-strip
included (ExtractTriples.scala:147-161).

The reference's (shipped-disabled) ``text()`` source reads the TREC
Washington Post JSONL corpus and builds one document per line:

    parse JSON → contents array → drop nulls
      → keep type == 'sanitized_html' AND subtype == 'paragraph'
      → Jsoup.parse(content).text()   (strip markup, normalize ws)
      → mkString(" ")                  (concat paragraphs)

This module reproduces that chain as pure column expressions — the
JSON parse is Spark's native JSONL reader with an explicit schema (no
schema inference pass over 100 TB), the per-block filter/strip/concat
are ``filter``/``transform``/``array_join`` higher-order functions, and
the HTML strip is the vectorized jsoup analog
:func:`dstlr_spark.functions.text.strip_html`. Map-only end to end:
zero shuffles, one scan, whole rows never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dstlr_spark.functions.text import strip_html

# explicit read schema: only the fields the chain touches — Spark's
# JSONL reader prunes the rest at parse time (ReadSchema, no inference)
WAPO_SCHEMA = (
    "id STRING, contents ARRAY<STRUCT<"
    "type: STRING, subtype: STRING, content: STRING>>"
)


def _paragraph_text(contents: Column) -> Column:
    """contents array → HTML-less paragraph concat (one document)."""
    kept = F.filter(
        contents,
        lambda x: x.isNotNull()
        & (F.coalesce(x["type"], F.lit("")) == "sanitized_html")
        & (F.coalesce(x["subtype"], F.lit("")) == "paragraph"),
    )
    stripped = F.transform(
        kept, lambda x: strip_html(F.coalesce(x["content"], F.lit("")))
    )
    return F.array_join(stripped, " ")


def wapo_documents(raw: DataFrame) -> DataFrame:
    """(id, contents-array) rows → DocumentRow-shaped (doc_id, text).

    ``raw`` carries the :data:`WAPO_SCHEMA` columns (from
    :func:`read_wapo_jsonl` or a test fixture). A null contents array
    yields an empty text, which the assembly F1/F2 filters drop —
    matching the reference, whose null-contents line would throw in the
    ujson chain and is pre-filtered upstream."""
    return raw.select(
        F.col("id").cast("string").alias("doc_id"),
        _paragraph_text(F.coalesce(F.col("contents"), F.array())).alias("text"),
    )


def read_wapo_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL file(s) → DocumentRow-shaped (doc_id, text)."""
    return wapo_documents(spark.read.schema(WAPO_SCHEMA).json(path))
