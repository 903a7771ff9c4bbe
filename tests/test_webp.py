"""WebP-lossless (VP8L) codec tests — the same gate model as
tests/test_flac.py / test_tiff.py: round-trip matrices over every
decode path (all 14 predictors, color transform, subtract-green,
palette bundling widths, color cache, LZ77 runs, meta-free simple and
normal prefix headers), hand-pinned spec vectors (LZ77 value coding,
the 2-D distance map, the color-cache hash), corruption contract, and
hypothesis round-trip fuzz.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dstlr_spark.operators.webp import (
    _BitReader,
    _DIST_MAP,
    _len_to_prefix,
    _lz77_value,
    decode_webp,
    encode_webp,
)


def test_lz77_value_coding_is_involutive_and_pinned():
    """The prefix-code/extra-bits split pinned against the RFC 9649
    examples: codes 0-3 are literals 1-4; code 4 starts the
    (2+parity)<<extra ladder."""
    # spec ladder: code 4 → values 5..6 (1 extra bit), code 5 → 7..8,
    # code 6 → 9..12 (2 extra bits), code 7 → 13..16 …
    pins = {5: (4, 1), 6: (4, 1), 7: (5, 1), 9: (6, 2), 16: (7, 2),
            17: (8, 3), 121: (13, 5), 4096: (23, 10)}
    for v, (code, extra) in pins.items():
        c, e, ev = _len_to_prefix(v)
        assert (c, e) == (code, extra), v
        # feed the extra bits back through the decoder formula
        bits = bytearray()
        acc = ev
        by = bytes([(acc >> (8 * k)) & 0xFF for k in range(3)])
        br = _BitReader(by)
        assert _lz77_value(c, br) == v
    for v in range(1, 5):
        assert _len_to_prefix(v) == (v - 1, 0, 0)


def test_distance_map_pins():
    """First rows of the 120-entry map pinned against the RFC table,
    and the scan-order distance rule dist = dx + dy·w (min 1)."""
    assert _DIST_MAP[0] == (0, 1)   # pixel directly above
    assert _DIST_MAP[1] == (1, 0)   # pixel to the left
    assert _DIST_MAP[2] == (1, 1)   # above-left
    assert _DIST_MAP[3] == (-1, 1)  # above-right
    assert _DIST_MAP[119] == (8, 7)
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_roundtrip_plain_runs_cache_subgreen():
    rng = np.random.default_rng(1)
    for (h, w) in ((1, 1), (3, 5), (8, 8), (16, 9)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        img[:, : w // 2] = img[0, 0]
        for kw in (dict(), dict(use_runs=False), dict(subtract_green=True),
                   dict(cache_bits=4),
                   dict(subtract_green=True, cache_bits=6)):
            assert np.array_equal(decode_webp(encode_webp(img, **kw)), img), kw


def test_roundtrip_palette_all_bundling_widths():
    rng = np.random.default_rng(2)
    for ncol in (2, 3, 4, 7, 16, 17, 40, 200, 256):
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        img = pal[rng.integers(0, ncol, (9, 13))]
        assert np.array_equal(
            decode_webp(encode_webp(img, palette=True)), img
        ), ncol


def test_roundtrip_every_predictor_mode():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    for mode in range(14):
        blob = encode_webp(img, predictor=(9, [0xFF000000 | (mode << 8)]))
        assert np.array_equal(decode_webp(blob), img), mode
    # fine blocks with mixed modes
    pw, ph = (13 + 3) // 4, (11 + 3) // 4
    modes = [0xFF000000 | (int(m) << 8)
             for m in rng.integers(0, 14, pw * ph)]
    assert np.array_equal(
        decode_webp(encode_webp(img, predictor=(2, modes))), img
    )


def test_roundtrip_color_transform():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
    pw, ph = (12 + 3) // 4, (10 + 3) // 4
    ctes = [0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b)
            for r, g, b in rng.integers(0, 256, (pw * ph, 3))]
    assert np.array_equal(
        decode_webp(encode_webp(img, color_transform=(2, ctes))), img
    )


def test_color_cache_hash_pin():
    """The cache key is (0x1e35a7bd · argb) mod 2³² >> (32 − bits) —
    pinned on a hand-computed value so a transcription slip in either
    side's constant cannot cancel out."""
    argb = 0xFF102030
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - 6)
    assert key == (0x1E35A7BD * 0xFF102030 % (1 << 32)) // (1 << 26)
    # a cache round-trip must reproduce repeated non-adjacent colors
    img = np.zeros((2, 8, 3), np.uint8)
    img[0, ::2] = (16, 32, 48)
    img[1, 1::2] = (16, 32, 48)
    img[0, 1::2] = (200, 100, 50)
    img[1, ::2] = (200, 100, 50)
    assert np.array_equal(
        decode_webp(encode_webp(img, cache_bits=6, use_runs=False)), img
    )


def test_dispatch_and_planted_equality():
    from dstlr_spark.operators.multimodal import (
        _planted_rgb,
        decode_rgb_bytes,
        encode_bmp,
    )

    rgb = _planted_rgb(6, 5)
    ref = decode_rgb_bytes(encode_bmp(rgb))
    got = decode_rgb_bytes(encode_webp(rgb, subtract_green=True,
                                       cache_bits=4))
    assert np.array_equal(got, ref)


def test_stub_surfaces_and_malformed():
    blob = encode_webp(np.zeros((2, 2, 3), np.uint8))
    lossy = blob[:12] + b"VP8 " + blob[16:]
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    vp8x = blob[:12] + b"VP8X" + blob[16:]
    with pytest.raises(NotImplementedError):
        decode_webp(vp8x)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):  # bad signature byte
        bad = bytearray(blob)
        bad[20] ^= 0xFF
        decode_webp(bytes(bad))


def test_corruption_contract():
    """Truncation at every offset + seeded mutations: only ValueError
    / NotImplementedError may escape."""
    import random

    from dstlr_spark.operators.multimodal import decode_rgb_bytes

    rng = random.Random(55)
    nprng = np.random.default_rng(55)
    img = nprng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
    pal = nprng.integers(0, 256, (5, 3)).astype(np.uint8)
    streams = [
        encode_webp(img),
        encode_webp(img, subtract_green=True, cache_bits=4),
        encode_webp(pal[nprng.integers(0, 5, (6, 7))], palette=True),
        encode_webp(img, predictor=(2, [0xFF000000 | (m << 8) for m in
                                        (11, 12, 13, 7)])),
    ]
    for b in streams:
        for cut in range(len(b)):
            try:
                decode_rgb_bytes(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for i in range(150):
            m = bytearray(b)
            for _ in range(rng.randint(1, 4)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                decode_rgb_bytes(bytes(m))
            except (ValueError, NotImplementedError):
                pass


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 20), h=st.integers(1, 14), seed=st.integers(0, 2**31),
       ncol=st.integers(2, 64), cache=st.sampled_from([0, 3, 8]))
def test_fuzz_webp_roundtrip(w, h, seed, ncol, cache):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    assert np.array_equal(
        decode_webp(encode_webp(img, cache_bits=cache)), img
    )
    assert np.array_equal(
        decode_webp(encode_webp(img, palette=True)), img
    )
    mode = int(rng.integers(0, 14))
    assert np.array_equal(
        decode_webp(
            encode_webp(img, predictor=(9, [0xFF000000 | (mode << 8)]))
        ),
        img,
    )


def test_header_order_cache_before_meta():
    """RFC 9649 §4.3: color-cache-info precedes the meta-prefix bit.
    Pin the bit positions in an encoded stream (found by review: an
    encoder/decoder pair with BOTH sides swapped round-trips green
    while rejecting every real WebP — only a bit-level pin catches
    it)."""
    img = np.zeros((2, 2, 3), np.uint8)
    blob = encode_webp(img, cache_bits=4)
    bits = _BitReader(blob[21:])  # skip RIFF header + signature byte
    assert bits.read(14) == 1  # width-1
    assert bits.read(14) == 1  # height-1
    bits.read(1)               # alpha hint
    assert bits.read(3) == 0   # version
    assert bits.read(1) == 0   # no transforms
    assert bits.read(1) == 1   # color-cache-info FIRST …
    assert bits.read(4) == 4   # … carrying cache_bits
    assert bits.read(1) == 0   # THEN the meta-prefix bit
