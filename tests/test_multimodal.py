"""Multimodal plumbing: binary schema, header parse, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dstlr_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    media_metadata,
    resize_image,
    sniff_media_type,
    synth_media,
)


def _media(spark):
    docs = spark.createDataFrame(
        [("d1", "hello world", 11), ("d2", "x" * 600, 600)],
        "doc_id string, text string, n_chars long",
    )
    return synth_media(docs)


def test_header_parse_dims(spark):
    meta = {r["doc_id"]: r for r in media_metadata(_media(spark)).collect()}
    assert meta["d1"]["media_type"] == "image/png"
    assert meta["d1"]["width"] == 11 % 512 + 1
    assert meta["d1"]["height"] == (11 * 7) % 512 + 1
    assert meta["d1"]["n_bytes"] == 24 + 11
    assert meta["d2"]["width"] == 600 % 512 + 1


def test_native_sniff_matches_parser(spark):
    m = _media(spark)
    sniffed = m.select("doc_id", sniff_media_type(F.col("payload")).alias("t"))
    parsed = media_metadata(m).select("doc_id", F.col("media_type").alias("t"))
    assert sorted(map(tuple, sniffed.collect())) == sorted(map(tuple, parsed.collect()))


def test_decode_stub_gating(spark):
    """No imaging library in this container → clearly-marked stub;
    fake mode exercises the full Spark path."""
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError, match="STUB"):
            decode_image(_media(spark))
    rows = {r["doc_id"]: r for r in decode_image(_media(spark), fake=True).collect()}
    assert rows["d1"]["width"] == 12 and len(rows["d1"]["pixels"]) == 16


def test_feature_histogram(spark):
    """Byte-histogram features are real (no codec) and sum to n_bytes."""
    rows = {r["doc_id"]: r for r in extract_features(_media(spark)).collect()}
    for r in rows.values():
        assert len(r["features"]) == 16
        assert sum(r["features"]) == r["n_bytes"]


def test_resize_stub_gating(spark):
    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError, match="STUB"):
            resize_image(_media(spark))
    rows = {r["doc_id"]: r for r in resize_image(_media(spark), fake=True).collect()}
    for r in rows.values():  # every thumb fits within max_side
        assert r["width"] is not None and r["width"] <= 64
        assert r["height"] is not None and r["height"] <= 64


def test_frame_sample_stride(spark):
    rows = frame_sample(_media(spark), every_n_bytes=10).collect()
    d1 = sorted(
        (r["frame_idx"], r["byte_offset"]) for r in rows if r["doc_id"] == "d1"
    )
    assert d1 == [(0, 0), (1, 10), (2, 20), (3, 30)]  # 35 bytes → 4 frames
