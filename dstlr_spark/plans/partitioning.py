"""Scan fan-out for map-heavy pipelines (optimization guide §2/§6).

The driver's testdata tables are single-file, single-row-group parquet:
a parquet scan cannot split below a row-group boundary, so every
downstream map stage (Arrow annotators, codec decode, LSH hashing,
GEMM blocks) inherits ONE partition and runs on one core of
``local[32]`` unless something re-spreads it.

:func:`fan_out` repartitions ONLY when the input has fewer partitions
than the session's parallelism — scale-adaptive by construction:

- locally (few row groups) it round-robins the small frame across all
  cores, one cheap exchange of the narrow projected columns;
- at 100 TB the scan already carries thousands of splits, the guard is
  false, and no exchange is added (a blanket ``repartition(n)`` there
  would be a full shuffle of the corpus — the anti-pattern the guide
  warns about).

Round-robin (keyless) repartition is used deliberately: there is no
join/aggregation key to co-partition for — the goal is purely even
map-side spread — and Spark's sort-before-repartition keeps the
row-to-partition assignment deterministic under task retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Spread ``df`` across at least ``defaultParallelism * multiple``
    partitions, unless it already is."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    # JVM-side partition probe: df.rdd.getNumPartitions() round-trips
    # the plan through the Python RDD conversion (~0.1-1 s per fresh
    # DataFrame); the executedPlan probe is a few ms and runs no job
    n = df._jdf.queryExecution().executedPlan().execute().getNumPartitions()
    if n >= target:
        return df
    return df.repartition(target)
