"""Driver-contract query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL over the
driver's pre-registered views). ``__spark_entry__`` aggregates them.

Rules that keep the driver's value-hash comparison green:
- every computed column aliased identically in Spark and SQL;
- doubles only when both engines produce bit-identical IEEE results
  (same integer inputs, same expression shape) — otherwise decimals or
  rounding via the shared helpers in :mod:`dstlr_spark.queries.sqlgen`;
- no engine-specific collation assumptions: comparison is
  order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    """Registry module order == the order the driver's gate runs
    queries. The similarity / multimodal / streaming modules run right
    after the KG block: the r2 gate ran out of budget at the tail and
    truncated exactly there, so the historically-at-risk surface runs
    early and the cheap relational/text modules absorb any truncation."""
    from dstlr_spark.queries import (
        curation,
        dedup,
        doc_kg,
        multimodal,
        relational,
        similarity,
        streamgate,
        textstats,
        tokenizer,
    )

    return (
        tokenizer,  # never-gated queries lead the registry
        curation,  # round-3 additions: never-gated queries lead the registry
        doc_kg,
        similarity,
        multimodal,
        streamgate,
        dedup,
        textstats,
        relational,
    )
