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
    from dstlr_spark.queries import (
        dedup,
        doc_kg,
        multimodal,
        relational,
        similarity,
        textstats,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (doc_kg, relational, textstats, dedup, similarity, multimodal):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from dstlr_spark.queries import (
        dedup,
        doc_kg,
        multimodal,
        relational,
        similarity,
        textstats,
    )

    out: dict[str, str] = {}
    for mod in (doc_kg, relational, textstats, dedup, similarity, multimodal):
        out.update(mod.ORACLES)
    return out
