"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native as-of join (pyspark_guide: bucketize or merge_asof).
Two strategies, semantics-identical (pinned by tests):

- :func:`asof_join`           — union + window ``last_value`` over the
  merged, time-ordered stream per key. ONE shuffle (by key), no
  quadratic blow-up, no range-condition join: the scalable default.
- :func:`asof_join_pandas`    — ``applyInPandas`` + ``pd.merge_asof``
  per key group: the slot for richer policies (tolerance windows,
  nearest instead of backward).

The reference has no as-of join (SURVEY §2.5 'no as-of/range joins');
this is an engine addition for the events/telemetry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    right_cols: list[str],
) -> DataFrame:
    """For every left row: values of ``right_cols`` from the most recent
    right row with ``right.on <= left.on`` within the same ``key``.

    Implementation: tag and union both sides, sort per key by
    (on, side) with right rows first at equal timestamps, and carry the
    last seen right ROW forward as ONE struct with
    ``last(struct(...), ignorenulls=True)`` over an unbounded-preceding
    window — a single exchange on ``key``. Carrying the whole row as a
    struct (not per-column) preserves merge_asof/DuckDB ASOF semantics:
    the matched row's values travel together, including its NULLs — a
    per-column carry would backfill a NULL from an OLDER right row and
    could mix columns from different right rows.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    r_struct_type = T.StructType([right.schema[c] for c in right_cols])
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, key) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        *lcols,
        "_side",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_rlast"),
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col("_rlast")[c].alias(f"asof_{c}") for c in right_cols],
        )
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    right_cols: list[str],
) -> DataFrame:
    """merge_asof variant (grouped-map). Same backward semantics."""
    import pandas as pd

    l_sel = left
    r_sel = right.select(key, on, *right_cols)
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"asof_{c} {right.schema[c].dataType.simpleString()}"
            for c in right_cols
        ]
    )
    tagged = l_sel.withColumn("_side", F.lit(1)).unionByName(
        r_sel.withColumn("_side", F.lit(0)), allowMissingColumns=True
    )
    # capture plain column-name lists, never DataFrames (SPARK-5063)
    keep = [f.name for f in l_sel.schema.fields] + [f"asof_{c}" for c in right_cols]
    rename = {c: f"asof_{c}" for c in right_cols}

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["_side"] == 1].sort_values(on, kind="mergesort")
        rp = pdf[pdf["_side"] == 0].sort_values(on, kind="mergesort")
        if lp.empty:
            return pd.DataFrame(columns=keep)
        merged = pd.merge_asof(
            lp,
            rp[[on] + right_cols].rename(columns=rename),
            on=on,
            direction="backward",
        )
        return merged[keep]

    return tagged.groupBy(key).applyInPandas(per_key, out_schema)
