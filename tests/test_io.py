"""Catalog-agnostic IO layer: bucket-partitioned write + read-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from dstlr_spark.sources.io import read_table, write_table


def test_bucketed_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"c{i}", f"text {i}") for i in range(50)], "conv_id string, text string"
    )
    loc = str(tmp_path / "tbl")
    write_table(df, loc, bucket_key="conv_id", n_buckets=4)
    back = read_table(spark, loc)
    assert "bucket" in back.columns
    assert back.select("bucket").distinct().count() <= 4
    got = sorted(map(tuple, back.select("conv_id", "text").collect()))
    assert got == sorted(map(tuple, df.collect()))
    # idempotent overwrite (K2/MERGE semantics)
    write_table(df, loc, bucket_key="conv_id", n_buckets=4)
    assert read_table(spark, loc).count() == 50


def test_plain_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    loc = str(tmp_path / "plain")
    write_table(df, loc)
    assert read_table(spark, loc).collect() == df.collect()
