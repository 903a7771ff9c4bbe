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


# --------------------------------------------------------------------------
# round 5: REAL pixel decode (pure-NumPy BMP/PPM) — no Spark needed
# --------------------------------------------------------------------------


def test_bmp_roundtrip_and_orientation():
    """encode_bmp → decode_rgb_bytes is the identity, including the
    bottom-up flip and BGR→RGB swap (an asymmetric image catches
    both), and rows pad to 4 bytes (w=3 → stride 12 ≠ 9)."""
    import numpy as np

    from dstlr_spark.operators.multimodal import decode_rgb_bytes, encode_bmp

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    out = decode_rgb_bytes(encode_bmp(rgb))
    assert out.shape == (5, 3, 3) and (out == rgb).all()


def test_bmp_topdown_negative_height():
    """A top-down BMP (negative height) decodes without the flip."""
    import struct

    import numpy as np

    from dstlr_spark.operators.multimodal import decode_rgb_bytes, encode_bmp

    rgb = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    b = bytearray(encode_bmp(rgb[::-1]))  # flip rows, then mark top-down
    b[22:26] = struct.pack("<i", -2)
    assert (decode_rgb_bytes(bytes(b)) == rgb[::-1][::-1]).all()


def test_ppm_p6_with_comment():
    import numpy as np

    from dstlr_spark.operators.multimodal import decode_rgb_bytes

    rgb = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    payload = b"P6\n# synthetic\n4 2\n255\n" + rgb.tobytes()
    assert (decode_rgb_bytes(payload) == rgb).all()


def test_unsupported_codecs_raise_not_implemented():
    import struct

    import pytest

    from dstlr_spark.operators.multimodal import decode_rgb_bytes

    with pytest.raises(NotImplementedError):
        decode_rgb_bytes(bytes.fromhex("89504E470D0A1A0A") + b"\0" * 32)  # PNG
    # 8-bit paletted BMP: real header, unsupported bpp
    hdr = (
        b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    )
    with pytest.raises(NotImplementedError):
        decode_rgb_bytes(hdr + b"\0" * 46)


def test_resize_nearest_matches_index_math():
    """Thumb pixel (X, Y) must sample source ((X·w) DIV tw, (Y·h) DIV th)
    — the exact rule the DuckDB oracle re-derives — and small images
    pass through untouched."""
    import numpy as np

    from dstlr_spark.operators.multimodal import resize_nearest

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    th = resize_nearest(rgb, 4)
    assert th.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert (th[y, x] == rgb[(y * 6) // 3, (x * 8) // 4]).all()
    assert (resize_nearest(rgb, 8) == rgb).all()


def test_decode_image_np_isolates_bad_payloads(spark):
    """One decodable BMP + one compressed payload in a batch: the bad
    row degrades to null dims (X2 failure isolation), the good row
    decodes fully."""
    import numpy as np

    from dstlr_spark.operators.multimodal import decode_image_np, encode_bmp

    good = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    bad = bytes.fromhex("89504E470D0A1A0A") + b"\0" * 16
    media = spark.createDataFrame(
        [("g", bytearray(good)), ("b", bytearray(bad))],
        "doc_id string, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_np(media).collect()}
    assert rows["g"].width == 2 and rows["g"].pixels == [0] * 12
    assert rows["b"].width is None and rows["b"].pixels is None


def test_decode_features_np_matches_materialized_decode(spark):
    """The in-stage-reduce decode (100 TB shape, never ships pixels)
    must agree value-for-value with the materializing decode the gate
    checks: dims, checksum, orientation probes, channel means — plus
    the same null-row failure isolation."""
    import numpy as np

    from dstlr_spark.operators.multimodal import (
        _planted_rgb,
        decode_features_np,
        decode_image_np,
        encode_bmp,
    )

    imgs = {f"d{i}": _planted_rgb(3 + i, 2 + 2 * i) for i in range(4)}
    rows = [(k, bytearray(encode_bmp(v))) for k, v in imgs.items()]
    rows.append(("bad", bytearray(b"\x89PNG\r\n\x1a\n" + b"\0" * 16)))
    media = spark.createDataFrame(rows, "doc_id string, payload binary")

    feats = {r.doc_id: r for r in decode_features_np(media).collect()}
    full = {r.doc_id: r for r in decode_image_np(media).collect()}

    for k, rgb in imgs.items():
        f, m = feats[k], full[k]
        assert (f.width, f.height) == (m.width, m.height) == (
            rgb.shape[1], rgb.shape[0])
        assert f.pixel_sum == sum(m.pixels) == int(rgb.sum(dtype=np.int64))
        assert f.px_first_r == m.pixels[0] and f.px_last_b == m.pixels[-1]
        means = rgb.reshape(-1, 3).mean(axis=0)
        assert abs(f.mean_r - means[0]) < 1e-9
        assert abs(f.mean_g - means[1]) < 1e-9
        assert abs(f.mean_b - means[2]) < 1e-9
    assert feats["bad"].width is None and feats["bad"].pixel_sum is None
