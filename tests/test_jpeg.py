"""Baseline JPEG codec gate (dstlr_spark/operators/jpeg.py).

JPEG is lossy, so it cannot join the format-blind mm_media_decode
planted-value oracle (BASELINE.json's exact-value contract). The gate
here is the next-strongest thing: ANALYTIC exactness wherever the
math is exact (constant 8×8 blocks survive quantize→IDCT bit-for-bit;
solid-color images reproduce the closed-form YCbCr round-trip), tight
pinned tolerances where quantization genuinely rounds, decoder-only
hand-built streams so the decoder is not graded by its own encoder
alone, and the package-wide exception contract (malformed →
ValueError, unimplemented modes → NotImplementedError)."""

import struct

import numpy as np
import pytest

from dstlr_spark.operators.jpeg import (
    _ZIGZAG,
    _dct_basis,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG) == list(range(64))
    # spec spot-pins (T.81 Fig. A.6): first diagonal and the tail
    assert _ZIGZAG[:6] == (0, 1, 8, 16, 9, 2)
    assert _ZIGZAG[-3:] == (55, 62, 63)


def test_dct_basis_orthonormal():
    a = _dct_basis()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)


def test_gray_constant_blocks_exact():
    """Constant 8×8 blocks round-trip EXACTLY with the all-ones quant
    table: every AC is an exact float zero and the DC (8·(v−128))
    rounds back to the planted integer — assert equality, not
    tolerance, across frame sizes that exercise MCU edge padding."""
    rng = np.random.default_rng(11)
    for w, h in ((8, 8), (16, 8), (24, 16), (5, 7), (17, 9), (1, 1)):
        blocks = rng.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8),
                              dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:h, :w]
        out = decode_jpeg(encode_jpeg(img))
        assert (out == np.repeat(img[..., None], 3, 2)).all(), (w, h)


def test_gray_random_offby_one_bound():
    """Arbitrary gray content at quant=1: the only loss is coefficient
    rounding (≤0.5 per coefficient) — pinned max error ≤ 1 grey level."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0].astype(int)
    assert np.abs(out - img.astype(int)).max() <= 1


def _ycc_roundtrip(rgb):
    """Closed-form expected decode of a solid-color JPEG: forward JFIF
    RGB→YCbCr rounding, then the decoder's inverse — computed here
    independently of the codec module's code paths."""
    r, g, b = (float(v) for v in rgb)
    y = round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = min(255, max(0, round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)))
    cr = min(255, max(0, round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)))
    return np.array(
        [
            np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255),
            np.clip(
                np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
                0, 255,
            ),
            np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255),
        ],
        np.uint8,
    )


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_rgb_solid_colors_match_analytic(subsample):
    """Solid-color frames decode to the closed-form YCbCr round-trip
    EXACTLY in both 4:4:4 and 4:2:0 — constant chroma makes the 2×2
    averaging lossless, so this pins the subsampled MCU layout and the
    repeat-upsample path with zero tolerance."""
    for color in ((10, 200, 30), (255, 0, 128), (17, 17, 17),
                  (0, 0, 0), (255, 255, 255), (1, 254, 3)):
        img = np.zeros((16, 24, 3), np.uint8)
        img[:] = color
        out = decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert (out == _ycc_roundtrip(color)).all(), (color, subsample)


def test_rgb_random_tolerance_and_420_shape():
    """Arbitrary RGB content: YCbCr round-trip + coefficient rounding —
    pinned max error ≤ 4 per channel at 4:4:4. For 4:2:0 the random
    image is made 2×2-block-constant so the chroma averaging is
    LOSSLESS — any residual is the same rounding budget, so a loose
    result there means the subsampled MCU layout or the upsample
    scatter is wrong, not that chroma noise was averaged away."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img)).astype(int)
    assert np.abs(out - img.astype(int)).max() <= 4
    blocky = np.repeat(
        np.repeat(rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8), 2, 0),
        2, 1,
    )
    out420 = decode_jpeg(encode_jpeg(blocky, subsample="420")).astype(int)
    assert np.abs(out420 - blocky.astype(int)).max() <= 4


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    for ri in (1, 2, 5):
        assert (decode_jpeg(encode_jpeg(img, restart_interval=ri)) == base).all()
    rgb = rng.integers(0, 256, size=(16, 32, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg(rgb, subsample="420", restart_interval=1))
        == decode_jpeg(encode_jpeg(rgb, subsample="420"))
    ).all()


def test_decoder_only_dc_stream():
    """A DC-only grayscale JPEG built BYTE BY BYTE here (not via
    encode_jpeg): quant[DC]=8, single 8×8 block, Huffman tables with
    one 2-bit DC code and one 2-bit AC EOB code. Dequantized DC = 8q →
    IDCT = q everywhere → pixel = q + 128. Pins marker parsing,
    canonical Huffman build, EXTEND, dequant and IDCT against hand
    math, independent of the fixture encoder."""
    q = 25  # planted DC value → expected pixel 153
    # DC table: two 2-bit codes → '00' = category 5, '01' = category 0
    # AC table: two 2-bit codes → '00' = EOB, '01' = (0,1)
    # bits: 00 (cat 5) + 11001 (+25) + 00 (EOB) → 00110010 0...pad 1s
    # → entropy bytes 0x32 0x7F
    dqt = bytes([0x00]) + bytes([8] + [1] * 63)
    dht_dc = bytes([0x00]) + bytes([0, 2, 0, 0, 0, 0, 0, 0,
                                    0, 0, 0, 0, 0, 0, 0, 0]) + bytes([5, 0])
    dht_ac = bytes([0x10]) + bytes([0, 2, 0, 0, 0, 0, 0, 0,
                                    0, 0, 0, 0, 0, 0, 0, 0]) + bytes([0x00, 0x01])
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    stream = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        + b"\x32\x7f"
        + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    assert out.shape == (8, 8, 3)
    assert (out == q + 128).all()


def test_progressive_equals_baseline_exactly():
    """decode(progressive) == decode(baseline) BIT-FOR-BIT: both
    encoders emit the same quantized coefficients, so any divergence
    is a defect in the progressive scan machinery (spectral-selection
    block traversal, EOBRUN bookkeeping, DC/AC successive-approximation
    shifts, or the refinement correction-bit walk). Sweeps gray + RGB
    at 4:4:4 and 4:2:0 across frame sizes that exercise MCU padding
    and the non-interleaved component grids."""
    from dstlr_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    for w, h in ((8, 8), (24, 16), (5, 7), (17, 9), (1, 1)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg_progressive(img))
            == decode_jpeg(encode_jpeg(img))
        ).all(), (w, h)
    for ss in ("444", "420"):
        for w, h in ((16, 16), (7, 5), (33, 17)):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (
                decode_jpeg(encode_jpeg_progressive(img, subsample=ss))
                == decode_jpeg(encode_jpeg(img, subsample=ss))
            ).all(), (ss, w, h)


def test_progressive_scan_scripts_and_restarts():
    """Every scan-script knob lands the identical image: deeper
    successive approximation (more refinement scans → more
    correction-bit traffic), single-band vs narrow-band spectral
    splits (EOBRUN vs ZRL pressure), Al=0 (no approximation at all),
    and restart intervals inside progressive scans (per-scan RSTn
    resync with DC-predictor and EOBRUN reset)."""
    from dstlr_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample="420"))
    for dc_al, ac_al, bands, ri in (
        (2, 2, ((1, 2), (3, 9), (10, 63)), 0),
        (0, 0, ((1, 63),), 0),
        (1, 3, ((1, 5), (6, 63)), 0),
        (1, 1, ((1, 5), (6, 63)), 2),
        (3, 2, ((1, 1), (2, 63)), 1),
    ):
        out = decode_jpeg(
            encode_jpeg_progressive(
                img, subsample="420", dc_al=dc_al, ac_al=ac_al,
                bands=bands, restart_interval=ri,
            )
        )
        assert (out == base).all(), (dc_al, ac_al, bands, ri)


def test_progressive_partial_and_invalid_scans():
    """A DC-only progressive stream (no AC scans ever) still decodes —
    to the blockwise-DC image, which for constant blocks is EXACT; a
    progressive scan mixing DC and AC bands (Ss=0, Se>0) is malformed
    (ValueError); an AC scan naming two components is malformed."""
    import struct as _struct

    from dstlr_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    blocks = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    full = encode_jpeg_progressive(img, dc_al=0)
    # truncate after the first (DC) scan: find the second SOS and cut,
    # then close with EOI — constant blocks carry no AC energy, so the
    # DC-only decode is already exact
    second_sos = full.find(b"\xff\xda", full.find(b"\xff\xda") + 2)
    assert second_sos > 0
    partial = full[:second_sos] + b"\xff\xd9"
    assert (decode_jpeg(partial) == np.repeat(img[..., None], 3, 2)).all()

    bad = bytearray(full)
    first_sos = bad.find(b"\xff\xda")
    # SOS payload: len(2) ns(1) [cs td/ta]*ns Ss Se AhAl — corrupt Se
    ns = bad[first_sos + 4]
    bad[first_sos + 5 + 2 * ns + 1] = 63  # DC scan with Se=63
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    hdr = encode_jpeg_progressive(
        np.zeros((8, 8, 3), np.uint8), dc_al=0, ac_al=0, bands=((1, 63),)
    )
    bad = bytearray(hdr)
    # find the first AC SOS (single component) and claim 2 components
    pos = bad.find(b"\xff\xda")
    pos = bad.find(b"\xff\xda", pos + 2)  # skip DC scan
    assert bad[pos + 4] == 1
    with pytest.raises(ValueError):
        # widen ns without widening the header: now structurally wrong
        bad2 = bytearray(bad)
        bad2[pos + 4] = 2
        decode_jpeg(bytes(bad2))


def test_malformed_and_stub_contract():
    """Package-wide exception contract: malformed → ValueError,
    unimplemented JPEG modes → NotImplementedError — never
    struct.error/KeyError/IndexError escaping into an Arrow batch."""
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + b"\0" * 32)  # garbage marker
    with pytest.raises(ValueError):
        decode_jpeg(b"PK\x03\x04")  # not a JPEG at all
    bad = bytearray(good)
    sof_at = bad.find(b"\xff\xc0")
    bad[sof_at + 1] = 0xC2  # flip SOF0 → SOF2: the full-band baseline
    # scan is INVALID as a progressive scan (mixes DC and AC bands)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sof_at + 1] = 0xCD  # SOF13 without a DHP: malformed, not a stub
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sof_at + 1] = 0xCE  # SOF14 without a DHP: malformed, not a stub
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sof_at + 4] = 10  # precision 10-bit: DCT decode is 8/12 only
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))
    # scan referencing a Huffman table that was never defined
    stream_missing_dht = good.replace(b"\xff\xc4", b"\xff\xfe", 2)
    with pytest.raises(ValueError):
        decode_jpeg(stream_missing_dht)


def test_dispatch_and_operator_isolation(spark):
    """decode_rgb_bytes routes FFD8 payloads to the JPEG path, and the
    decode_image_np operator isolates one corrupt JPEG per batch
    (null-dimension row) without killing its neighbors."""
    from dstlr_spark.operators.multimodal import decode_image_np, decode_rgb_bytes

    img = np.repeat(np.repeat(
        np.array([[40, 200], [90, 130]], np.uint8), 8, 0), 8, 1)
    payload = encode_jpeg(img)
    assert (decode_rgb_bytes(payload) == np.repeat(img[..., None], 3, 2)).all()

    media = spark.createDataFrame(
        [("a", bytearray(payload)), ("b", bytearray(b"\xff\xd8\xff" + b"\0" * 8))],
        "doc_id string, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_image_np(media).collect()}
    assert rows["a"]["width"] == 16 and rows["a"]["height"] == 16
    assert sum(rows["a"]["pixels"]) == int(img.astype(np.int64).sum()) * 3
    assert rows["b"]["width"] is None and rows["b"]["pixels"] is None


# --------------------------------------------------------------------------
# property fuzz — progressive ≡ baseline holds for ARBITRARY content,
# scan scripts, and frame shapes (pure codec layer, no Spark)
# --------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    subsample=st.sampled_from(["444", "420"]),
    dc_al=st.integers(0, 3),
    ac_al=st.integers(0, 3),
    split=st.integers(1, 62),
    ri=st.integers(0, 3),
)
def test_fuzz_progressive_equals_baseline(
    w, h, seed, color, subsample, dc_al, ac_al, split, ri
):
    from dstlr_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    sub = subsample if color else "444"
    base = decode_jpeg(encode_jpeg(img, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, subsample=sub, dc_al=dc_al, ac_al=ac_al,
            bands=((1, split), (split + 1, 63)) if split < 63 else ((1, 63),),
            restart_interval=ri,
        )
    )
    assert (prog == base).all()


# --------------------------------------------------------------------------
# SOF3 lossless (T.81 Annex H) — the one JPEG mode with EXACT decode,
# so round-trip equality is the oracle (no tolerance bands)
# --------------------------------------------------------------------------


def test_lossless_roundtrip_all_predictors():
    """decode(encode_lossless(img, pred)) == img exactly for every
    H.1.2.1 predictor, gray and RGB, on dimensions that exercise the
    first-row/first-column boundary rules."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(7)
    for pred in range(1, 8):
        img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
        assert out.shape == (13, 17, 3)
        assert (out == np.repeat(img[..., None], 3, 2)).all(), pred
    rgb = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_lossless(rgb, predictor=4)) == rgb).all()
    # 1-pixel and 1-row/1-column degenerate shapes
    for shape in [(1, 1), (1, 9), (9, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg_lossless(img, predictor=4))[..., 0] == img
        ).all()


def test_lossless_16bit_point_transform_and_restarts():
    """16-bit precision decodes to exact uint16; point transform Pt
    realises decode == (img >> Pt) << Pt; restart intervals reset the
    predictor without changing pixels; modulo-2^16 difference wrap
    (the d == -32768 ≡ +32768 SSSS=16 case) survives extremes."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, size=(7, 5), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(img16, predictor=7))
    assert out.dtype == np.uint16
    assert (out[..., 0] == img16).all()
    # extreme alternation forces ±32768-class differences
    ext = np.zeros((4, 4), dtype=np.uint16)
    ext[::2, ::2] = 65535
    ext[1::2, 1::2] = 65535
    assert (
        decode_jpeg(encode_jpeg_lossless(ext, predictor=1))[..., 0] == ext
    ).all()
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=1, point_transform=3))
    assert (out[..., 0] == (img >> 3) << 3).all()
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=4, restart_interval=37))
    assert (out[..., 0] == img).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    pred=st.integers(1, 7),
    pt=st.integers(0, 4),
    ri=st.integers(0, 3),
    deep=st.booleans(),
)
def test_fuzz_lossless_exact(w, h, seed, color, pred, pt, ri, deep):
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    if deep:
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
    else:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg_lossless(
            img, predictor=pred, point_transform=pt,
            restart_interval=ri * 29,
        )
    )
    want = (img.astype(np.int64) >> pt) << pt
    got = out if color else out[..., 0]
    assert (got.astype(np.int64) == want).all()


def _subsampled_lossless_expected(img, sampling, pt=0):
    """The documented identity for subsampled lossless: each channel
    box-mean-downsampled (floor, edge-replicated pad) to its (yi, xi)
    grid, then replicated back up and cropped — what decode(encode)
    must equal exactly."""
    h, w = img.shape[:2]
    arr = img.astype(np.int64) >> pt
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    out = []
    for i, (hi, vi) in enumerate(sampling):
        ch = arr[..., i]
        fy, fx = vmax // vi, hmax // hi
        yi, xi = -(-h * vi // vmax), -(-w * hi // hmax)
        if fy == 1 and fx == 1:
            d = ch
        else:
            q = np.empty((yi * fy, xi * fx), np.int64)
            q[:h, :w] = ch
            q[h:, :w] = ch[-1:, :]
            q[:, w:] = q[:, w - 1 : w]
            d = q.reshape(yi, fy, xi, fx).sum(axis=(1, 3)) // (fy * fx)
        u = np.repeat(np.repeat(d << pt, fy, axis=0), fx, axis=1)[:h, :w]
        out.append(u)
    return np.stack(out, axis=2).astype(img.dtype)


def test_lossless_subsampled_roundtrip():
    """SOF3 with sampling factors != 1x1 (T.81 A.2.3 MCU sample
    interleave): decode(encode(img, sampling)) equals the
    deterministic box-mean downsample replicated back up, exactly —
    across 4:2:0/4:2:2/4:1:1-style factor sets, every predictor, odd
    dimensions (MCU padding + crop), and MCU-counted restarts."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(23)
    factor_sets = [
        [(2, 2), (1, 1), (1, 1)],  # 4:2:0
        [(2, 1), (1, 1), (1, 1)],  # 4:2:2
        [(4, 1), (1, 1), (1, 1)],  # 4:1:1
        [(1, 2), (1, 1), (1, 1)],  # vertical-only
        [(4, 4), (2, 2), (1, 1)],  # mixed three-tier
    ]
    for h, w in [(16, 16), (17, 19), (7, 5)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sampling in factor_sets:
            for pred in (1, 4, 7):
                for ri in (0, 3):
                    got = decode_jpeg(
                        encode_jpeg_lossless(
                            img, predictor=pred, restart_interval=ri,
                            sampling=sampling,
                        )
                    )
                    want = _subsampled_lossless_expected(img, sampling)
                    assert (got == want).all(), (h, w, sampling, pred, ri)


def test_lossless_subsampled_groups_16bit_and_legacy():
    """Subsampled multi-scan lossless (per-group scans walk their own
    MCU/raster grids, EOI assembly upsamples), 16-bit precision with a
    point transform, and the sampling=[(1,1),...] argument emitting
    byte-identical streams to the legacy all-1x1 encoder."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    s420 = [(2, 2), (1, 1), (1, 1)]
    for groups in ([(1,), (2, 3)], [(1, 2), (3,)], [(3,), (1,), (2,)]):
        got = decode_jpeg(
            encode_jpeg_lossless(
                img, predictor=4, groups=groups, sampling=s420,
                restart_interval=2,
            )
        )
        assert (got == _subsampled_lossless_expected(img, s420)).all(), groups
    img16 = rng.integers(0, 65536, size=(9, 14, 3), dtype=np.uint16)
    for pt in (0, 3):
        got = decode_jpeg(
            encode_jpeg_lossless(
                img16, predictor=7, point_transform=pt, sampling=s420
            )
        )
        assert got.dtype == np.uint16
        assert (got == _subsampled_lossless_expected(img16, s420, pt)).all()
    assert encode_jpeg_lossless(img, predictor=4) == encode_jpeg_lossless(
        img, predictor=4, sampling=[(1, 1)] * 3
    )
    with pytest.raises(ValueError):
        # Hmax=4 with Hi=3 is a non-integer ratio: fixture encoder rejects
        encode_jpeg_lossless(img, sampling=[(4, 1), (3, 1), (1, 1)])


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31),
    pred=st.integers(1, 7),
    pt=st.integers(0, 4),
    ri=st.integers(0, 3),
    f1=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2), (4, 2), (4, 4)]),
    f2=st.sampled_from([(1, 1), (2, 2)]),
    deep=st.booleans(),
    arith=st.booleans(),
)
def test_fuzz_lossless_subsampled_exact(
    w, h, seed, pred, pt, ri, f1, f2, deep, arith
):
    """Random factor sets / shapes / predictors / restarts / point
    transforms / precisions, both entropy layers: subsampled lossless
    decode equals the box-mean identity exactly (integer-ratio factor
    sets only — f2 divides f1 by construction)."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    sampling = [f1, f2, (1, 1)]
    rng = np.random.default_rng(seed)
    dtype = np.uint16 if deep else np.uint8
    img = rng.integers(
        0, 65536 if deep else 256, size=(h, w, 3), dtype=dtype
    )
    enc = encode_jpeg_lossless_arith if arith else encode_jpeg_lossless
    out = decode_jpeg(
        enc(
            img, predictor=pred, point_transform=pt,
            restart_interval=ri * 5, sampling=sampling,
        )
    )
    assert (out == _subsampled_lossless_expected(img, sampling, pt)).all()


def test_lossless_subsampled_arith_equals_huffman():
    """SOF11 subsampled lossless: the QM entropy layer over the same
    box-mean sample planes must decode pixel-identical to the SOF3
    Huffman twin — across factor sets, predictors, MCU-counted
    restarts, component groups with DAC conditioning, and 16-bit
    precision with a point transform."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(31)
    s420 = [(2, 2), (1, 1), (1, 1)]
    for h, w in [(16, 16), (17, 19), (7, 5)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sampling in (s420, [(2, 1), (1, 1), (1, 1)],
                         [(4, 4), (2, 2), (1, 1)]):
            for pred in (1, 4, 7):
                for ri in (0, 3):
                    ga = decode_jpeg(
                        encode_jpeg_lossless_arith(
                            img, predictor=pred, restart_interval=ri,
                            sampling=sampling,
                        )
                    )
                    gh = decode_jpeg(
                        encode_jpeg_lossless(
                            img, predictor=pred, restart_interval=ri,
                            sampling=sampling,
                        )
                    )
                    assert (ga == gh).all(), (h, w, sampling, pred, ri)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    for groups in ([(1,), (2, 3)], [(1, 2), (3,)]):
        ga = decode_jpeg(
            encode_jpeg_lossless_arith(
                img, predictor=4, groups=groups, sampling=s420,
                restart_interval=2, dc_cond=(2, 6),
            )
        )
        gh = decode_jpeg(
            encode_jpeg_lossless(
                img, predictor=4, groups=groups, sampling=s420,
                restart_interval=2,
            )
        )
        assert (ga == gh).all(), groups
    img16 = rng.integers(0, 65536, size=(9, 14, 3), dtype=np.uint16)
    for pt in (0, 3):
        ga = decode_jpeg(
            encode_jpeg_lossless_arith(
                img16, predictor=7, point_transform=pt, sampling=s420
            )
        )
        assert (ga == _subsampled_lossless_expected(img16, s420, pt)).all()
    assert encode_jpeg_lossless_arith(
        img, predictor=4
    ) == encode_jpeg_lossless_arith(img, predictor=4, sampling=[(1, 1)] * 3)


def test_lossless_malformed_contract():
    """Lossless scan-header violations are ValueError (malformed), the
    remaining SOF modes stay NotImplementedError, and decode_rgb_bytes
    dispatches SOF3 payloads through the exact path."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.multimodal import decode_rgb_bytes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    good = encode_jpeg_lossless(img, predictor=5)
    assert (decode_rgb_bytes(good)[..., 0] == img).all()
    sos_at = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos_at + 7] = 0  # Ss (predictor) = 0: invalid for lossless
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sos_at + 8] = 5  # Se must be 0 in a lossless scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sos_at + 9] = 8  # Pt >= precision
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 8])  # truncated entropy data
    sof_at = good.find(b"\xff\xc3")
    bad = bytearray(good)
    # SOF7's mode is now implemented (jpeg_hier), so a differential
    # frame with no leading DHP is MALFORMED, not unsupported
    bad[sof_at + 1] = 0xC7
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


# --------------------------------------------------------------------------
# SOF9 sequential arithmetic (QM coder) — gated by exact pixel equality
# with the Huffman twin: both entropy layers carry the IDENTICAL
# quantized coefficients, so their decodes must agree bit for bit
# --------------------------------------------------------------------------


def test_qm_coder_roundtrip_fuzz():
    """The raw QM coder round-trips arbitrary decision sequences over
    adversarial context schedules — including all-same-bit runs (deep
    MPS chains), alternating bits (switch churn), and many contexts
    interleaved (carry/stacked-0xFF paths)."""
    import random

    from dstlr_spark.operators.jpeg_arith import (
        _ArithDecoder,
        _ArithEncoder,
    )

    rng = random.Random(17)
    schedules = []
    for n, nctx, p1 in [(1, 1, 0.5), (50, 1, 0.0), (50, 1, 1.0),
                        (500, 4, 0.5), (2000, 16, 0.9),
                        (2000, 16, 0.02), (5000, 64, 0.3)]:
        schedules.append(
            [(rng.randrange(nctx), 1 if rng.random() < p1 else 0)
             for _ in range(n)]
        )
    # worst-case alternation on one context
    schedules.append([(0, i & 1) for i in range(3000)])
    for sched in schedules:
        nctx = max(c for c, _ in sched) + 1
        enc = _ArithEncoder()
        stats = bytearray(nctx)
        for c, bit in sched:
            enc.encode(stats, c, bit)
        data = enc.finish()
        # decoder reads the UNSTUFFED byte stream
        dec = _ArithDecoder(data.replace(b"\xff\x00", b"\xff"))
        stats = bytearray(nctx)
        got = [dec.decode(stats, c) for c, _ in sched]
        assert got == [b for _, b in sched]


def test_arith_equals_baseline_suite():
    """decode(encode_arith(x)) == decode(encode_huffman(x)) exactly,
    across shapes, subsampling, a real quant table, restart intervals,
    and pathological content (flat / extremes / checkerboard)."""
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(21)
    q = np.clip(np.arange(64).reshape(8, 8) * 3 + 8, 1, 255).astype(np.int32)
    for shape, sub, ri in [
        ((8, 8), "444", 0), ((5, 7), "444", 0), ((1, 1), "444", 0),
        ((16, 16, 3), "444", 0), ((16, 16, 3), "420", 0),
        ((23, 17, 3), "420", 2), ((32, 32, 3), "420", 1),
        ((24, 24), "444", 5),
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(
            encode_jpeg(img, quant=q, subsample=sub, restart_interval=ri)
        )
        ar = decode_jpeg(
            encode_jpeg_arith(img, quant=q, subsample=sub, restart_interval=ri)
        )
        assert (base == ar).all(), (shape, sub, ri)
    for img in [
        np.zeros((16, 16), np.uint8),
        np.full((16, 16), 255, np.uint8),
        np.tile(np.array([[0, 255]], np.uint8), (16, 8)),
    ]:
        assert (
            decode_jpeg(encode_jpeg_arith(img)) == decode_jpeg(encode_jpeg(img))
        ).all()
    # arithmetic coding should beat the fixed Huffman tables on size
    img = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    assert len(encode_jpeg_arith(img)) < len(encode_jpeg(img))


def test_arith_dac_conditioning():
    """Non-default conditioning emits a DAC segment and the decoder's
    DAC parse must recover the same L/U/Kx for the pixels to match —
    a wrong parse desynchronizes the context schedule immediately."""
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    for dc_cond, kx in [((0, 2), 1), ((1, 3), 63), ((2, 2), 20),
                        (None, 30), ((0, 4), None)]:
        payload = encode_jpeg_arith(img, dc_cond=dc_cond, ac_kx=kx)
        assert b"\xff\xcc" in payload
        assert (decode_jpeg(payload) == base).all(), (dc_cond, kx)
    # default conditioning omits DAC entirely
    assert b"\xff\xcc" not in encode_jpeg_arith(img)


def test_arith_malformed_and_stub_contract():
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_jpeg_arith(img)
    sof_at = good.find(b"\xff\xc9")
    bad = bytearray(good)
    bad[sof_at + 1] = 0xC5  # SOF5 without a DHP: malformed, not a stub
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # DAC with invalid conditioning values
    dac_bad = (
        good[:sof_at] + b"\xff\xcc\x00\x04\x11\x00" + good[sof_at:]
    )  # Tc=1 (AC) with Kx=0
    with pytest.raises(ValueError):
        decode_jpeg(dac_bad)
    # scan header must be full-band for sequential arithmetic
    sos_at = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos_at + 8] = 31  # Se
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # restart marker without DRI
    ri = encode_jpeg_arith(
        rng.integers(0, 256, size=(32, 32), dtype=np.uint8),
        restart_interval=1,
    )
    dri_at = ri.find(b"\xff\xdd")
    with pytest.raises(ValueError):
        decode_jpeg(ri[:dri_at] + ri[dri_at + 6 :])


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    subsample=st.sampled_from(["444", "420"]),
    ri=st.integers(0, 2),
    qscale=st.integers(1, 40),
)
def test_fuzz_arith_equals_baseline(w, h, seed, color, subsample, ri, qscale):
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    sub = subsample if color else "444"
    q = np.clip(np.arange(64).reshape(8, 8) * qscale // 8 + 1, 1, 255).astype(
        np.int32
    )
    base = decode_jpeg(
        encode_jpeg(img, quant=q, subsample=sub, restart_interval=ri)
    )
    ar = decode_jpeg(
        encode_jpeg_arith(img, quant=q, subsample=sub, restart_interval=ri)
    )
    assert (ar == base).all()


# --------------------------------------------------------------------------
# SOF10 progressive arithmetic — the SOF2 scan structure over the QM
# coder; gate: exact pixel equality vs BOTH Huffman twins (baseline and
# progressive), since all three emit identical quantized coefficients
# --------------------------------------------------------------------------


def test_progressive_arith_equals_baseline_suite():
    """decode(SOF10) == decode(SOF0) == decode(SOF2) bit for bit
    across gray/RGB, 4:4:4/4:2:0, MCU-padding frame sizes, scan-script
    knobs (approximation depths incl. Al=0, narrow spectral bands),
    restart intervals (per-scan QM + statistics + predictor reset),
    and DAC conditioning."""
    from dstlr_spark.operators.jpeg import encode_jpeg_progressive
    from dstlr_spark.operators.jpeg_arith import (
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(31)
    for w, h in ((8, 8), (24, 16), (5, 7), (1, 1)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg_progressive_arith(img))
            == decode_jpeg(encode_jpeg(img))
        ).all(), (w, h)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample="420"))
    for dc_al, ac_al, bands, ri, cond in (
        (1, 1, ((1, 5), (6, 63)), 0, {}),
        (2, 2, ((1, 2), (3, 9), (10, 63)), 0, {}),
        (0, 0, ((1, 63),), 0, {}),
        (1, 3, ((1, 5), (6, 63)), 2, {}),
        (3, 2, ((1, 1), (2, 63)), 1, {}),
        (1, 1, ((1, 5), (6, 63)), 0, dict(dc_cond=(1, 3), ac_kx=20)),
    ):
        payload = encode_jpeg_progressive_arith(
            img, subsample="420", dc_al=dc_al, ac_al=ac_al,
            bands=bands, restart_interval=ri, **cond,
        )
        assert (decode_jpeg(payload) == base).all(), (
            dc_al, ac_al, bands, ri, cond,
        )
        if cond:
            assert b"\xff\xcc" in payload  # DAC emitted and honored
    # and vs the progressive HUFFMAN twin on the same scan script
    assert (
        decode_jpeg(encode_jpeg_progressive_arith(img, subsample="420"))
        == decode_jpeg(encode_jpeg_progressive(img, subsample="420"))
    ).all()


def test_progressive_arith_malformed_contract():
    """Malformed SOF10 streams raise ValueError (package decoder
    exception contract): DC/AC band mixing, band bounds, bad
    successive-approximation pairs, restart without DRI."""
    from dstlr_spark.operators.jpeg_arith import (
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_jpeg_progressive_arith(img)
    # first SOS is the DC scan of the single gray component:
    # FFDA len2 ns(=1) (cid,tables) Ss Se AhAl → Se at +8, AhAl at +9
    sos_at = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos_at + 8] = 7  # Se != 0 on a DC scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sos_at + 9] = 0x75  # Ah=7 with Al=5: not a refinement chain
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    ri = encode_jpeg_progressive_arith(img, restart_interval=1)
    dri_at = ri.find(b"\xff\xdd")
    with pytest.raises(ValueError):
        decode_jpeg(ri[:dri_at] + ri[dri_at + 6 :])
    # truncation before any scan completes the frame
    with pytest.raises(ValueError):
        decode_jpeg(good[:sos_at] + b"\xff\xd9")


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    subsample=st.sampled_from(["444", "420"]),
    dc_al=st.integers(0, 3),
    ac_al=st.integers(0, 3),
    split=st.integers(1, 62),
    ri=st.integers(0, 3),
    qscale=st.integers(1, 40),
)
def test_fuzz_progressive_arith_equals_baseline(
    w, h, seed, color, subsample, dc_al, ac_al, split, ri, qscale
):
    from dstlr_spark.operators.jpeg_arith import (
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    sub = subsample if color else "444"
    q = np.clip(np.arange(64).reshape(8, 8) * qscale // 8 + 1, 1, 255).astype(
        np.int32
    )
    base = decode_jpeg(
        encode_jpeg(img, quant=q, subsample=sub, restart_interval=ri)
    )
    pa = decode_jpeg(
        encode_jpeg_progressive_arith(
            img, quant=q, subsample=sub, dc_al=dc_al, ac_al=ac_al,
            bands=((1, split), (split + 1, 63)) if split < 63 else ((1, 63),),
            restart_interval=ri,
        )
    )
    assert (pa == base).all()


# --------------------------------------------------------------------------
# SOF11 lossless arithmetic — exact decode (round-trip equality is the
# oracle) and twin-equality with the SOF3 Huffman decode
# --------------------------------------------------------------------------


def test_lossless_arith_roundtrip_all_predictors():
    """decode(encode_lossless_arith(img, pred)) == img EXACTLY for
    every H.1.2.1 predictor, gray and RGB, degenerate shapes included
    — and equals the SOF3 Huffman twin's decode (same prediction
    semantics, different entropy layer)."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(41)
    for pred in range(1, 8):
        img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_lossless_arith(img, predictor=pred))
        assert out.shape == (13, 17, 3)
        assert (out == np.repeat(img[..., None], 3, 2)).all(), pred
    rgb = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg_lossless_arith(rgb, predictor=4)) == rgb
    ).all()
    assert (
        decode_jpeg(encode_jpeg_lossless_arith(rgb, predictor=4))
        == decode_jpeg(encode_jpeg_lossless(rgb, predictor=4))
    ).all()
    for shape in [(1, 1), (1, 9), (9, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg_lossless_arith(img))[..., 0] == img
        ).all()
    # arithmetic coding beats the fixed Huffman table on random content
    big = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    assert len(encode_jpeg_lossless_arith(big)) < len(
        encode_jpeg_lossless(big)
    )


def test_lossless_arith_16bit_pt_restarts_dac():
    """16-bit precision (incl. the ±32768-class mod-2^16 differences
    extreme alternation forces), point transform (round-trip identity
    (x >> Pt) << Pt), restart intervals (QM + statistics + gradient +
    prediction reset), and DAC conditioning — all exact."""
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(43)
    img16 = rng.integers(0, 65536, size=(6, 9), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless_arith(img16))
    assert out.dtype == np.uint16
    assert (out[..., 0] == img16).all()
    # extreme alternation: ±32768-class differences every sample
    alt = np.zeros((4, 8), np.uint16)
    alt[:, 1::2] = 65535
    assert (
        decode_jpeg(encode_jpeg_lossless_arith(alt, predictor=1))[..., 0]
        == alt
    ).all()
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for pt in (1, 3):
        got = decode_jpeg(encode_jpeg_lossless_arith(img, point_transform=pt))
        assert (got == (img >> pt) << pt).all(), pt
    base = decode_jpeg(encode_jpeg_lossless_arith(img))
    for ri in (1, 2, 5):
        assert (
            decode_jpeg(encode_jpeg_lossless_arith(img, restart_interval=ri))
            == base
        ).all(), ri
    payload = encode_jpeg_lossless_arith(img, dc_cond=(2, 5))
    assert b"\xff\xcc" in payload
    assert (decode_jpeg(payload) == base).all()


def test_lossless_arith_malformed_contract():
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = encode_jpeg_lossless_arith(img)
    sos_at = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos_at + 7] = 0  # predictor 0 invalid
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    bad = bytearray(good)
    bad[sos_at + 9] = 8  # point transform >= precision
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    ri = encode_jpeg_lossless_arith(img, restart_interval=1)
    dri_at = ri.find(b"\xff\xdd")
    with pytest.raises(ValueError):
        decode_jpeg(ri[:dri_at] + ri[dri_at + 6 :])
    with pytest.raises(ValueError):
        encode_jpeg_lossless_arith(img, predictor=9)
    with pytest.raises(ValueError):
        encode_jpeg_lossless_arith(img, point_transform=8)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    pred=st.integers(1, 7),
    pt=st.integers(0, 3),
    ri=st.integers(0, 3),
    deep=st.booleans(),
)
def test_fuzz_lossless_arith_exact(w, h, seed, color, pred, pt, ri, deep):
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    dt = np.uint16 if deep else np.uint8
    img = rng.integers(0, 65536 if deep else 256, size=shape, dtype=dt)
    out = decode_jpeg(
        encode_jpeg_lossless_arith(
            img, predictor=pred, point_transform=pt, restart_interval=ri
        )
    )
    exp = (img >> pt) << pt
    got = out if color else out[..., 0]
    assert got.dtype == dt
    assert (got == exp).all()


def test_hierarchical_lossless_exact_roundtrip():
    """Annex-J pyramid: DHP + SOF3 first frame + EXP/SOF7 differential
    frames reconstruct the planted array bit-for-bit at every level
    count, gray and RGB, even and odd dims, 8- and 16-bit."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(41)
    for shape in [(8, 8), (9, 13), (1, 7), (16, 16, 3), (11, 5, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for levels in (1, 2, 3):
            if (1 << (levels - 1)) > max(img.shape[:2]):
                continue
            out = decode_jpeg(encode_jpeg_hier(img, levels=levels))
            exp = img if img.ndim == 3 else np.repeat(img[..., None], 3, 2)
            assert out.dtype == np.uint8
            assert (out == exp).all(), (shape, levels)
    img16 = rng.integers(0, 65536, size=(10, 14), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_hier(img16, levels=3))
    assert out.dtype == np.uint16
    assert (out[..., 0] == img16).all()


def test_hierarchical_predictors_and_restarts():
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hier(img, levels=2, restart_interval=7))
    assert (out == img).all()
    g = rng.integers(0, 256, size=(9, 9), dtype=np.uint8)
    for pred in range(1, 8):
        out = decode_jpeg(encode_jpeg_hier(g, levels=2, predictor=pred))
        assert (out[..., 0] == g).all(), pred


def test_hierarchical_exception_contract():
    """Malformed hierarchy → ValueError in every corner of the marker
    walk (the pinned package contract)."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = encode_jpeg_hier(img, levels=2)

    # bare SOF7 without DHP: the mode exists, the stream is malformed
    # (stripping DHP from `good` would NOT reach SOF7 — decode_jpeg
    # correctly returns at the end of the first SOF3 scan)
    bare_sof7 = (
        b"\xff\xd8\xff\xc7"
        + struct.pack(">H", 2 + 6 + 3)
        + struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(bare_sof7)

    # truncated EXP payload
    bad = good.replace(b"\xff\xdf\x00\x03\x11", b"\xff\xdf\x00\x02")
    with pytest.raises(ValueError):
        decode_jpeg(bad)

    # differential frame whose dims do not match the expanded reference
    sof7_at = good.find(b"\xff\xc7")
    bad = bytearray(good)
    bad[sof7_at + 6] += 1  # bump frame height low byte
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    # progressive frames inside a hierarchy now DECODE (the former
    # stub — value gates in test_hierarchical_progressive_exact_gates);
    # here, only the exception contract: a differential progressive
    # frame whose DHP-less twin is malformed stays ValueError
    bare_sof6 = bare_sof7.replace(b"\xff\xc7", b"\xff\xc6")
    with pytest.raises(ValueError):
        decode_jpeg(bare_sof6)

    # sequential-DCT differential relabel: now a VALID frame kind, but
    # the lossless scan header (Se=0) is malformed for it
    bad = bytearray(good)
    bad[sof7_at + 1] = 0xC5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    # second non-differential frame where the differential should be
    bad = bytearray(good)
    bad[sof7_at + 1] = 0xC3
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    # truncated entropy data in the differential scan
    with pytest.raises(ValueError):
        decode_jpeg(good[:-8] + b"\xff\xd9")


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    pred=st.integers(1, 7),
    ri=st.integers(0, 3),
    deep=st.booleans(),
    levels=st.integers(1, 4),
    arith=st.booleans(),
)
def test_fuzz_hierarchical_exact(
    w, h, seed, color, pred, ri, deep, levels, arith
):
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    if (1 << (levels - 1)) > max(h, w):
        levels = 1
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    dt = np.uint16 if deep else np.uint8
    img = rng.integers(0, 65536 if deep else 256, size=shape, dtype=dt)
    out = decode_jpeg(
        encode_jpeg_hier(
            img, levels=levels, predictor=pred, restart_interval=ri,
            arith=arith,
        )
    )
    got = out if color else out[..., 0]
    assert got.dtype == dt
    assert (got == img).all()


def test_hierarchical_arith_exact():
    """SOF11+SOF15 pyramids (the QM entropy layer under the same
    Annex-J diff structure) reconstruct exactly: RGB, grayscale,
    16-bit, CMYK (closed-form RGB), restart intervals, and DAC
    conditioning all round-trip bit-for-bit; corruption stays inside
    the pinned exception contract."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(181)
    rgb = rng.integers(0, 256, size=(14, 19, 3), dtype=np.uint8)
    enc = encode_jpeg_hier(rgb, levels=3, arith=True)
    assert b"\xff\xcb" in enc and b"\xff\xcf" in enc  # SOF11 + SOF15
    assert (decode_jpeg(enc) == rgb).all()

    gray16 = rng.integers(0, 65536, size=(12, 9), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_hier(gray16, levels=2, arith=True))
    assert out.dtype == np.uint16
    assert (out[..., 0] == gray16).all()

    cmyk = rng.integers(0, 256, size=(10, 11, 4), dtype=np.uint8)
    exp = np.clip(
        np.round(cmyk[..., :3].astype(float) * cmyk[..., 3:4].astype(float)
                 / 255), 0, 255
    ).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_hier(cmyk, levels=2, arith=True))
            == exp).all()

    # restart intervals + DAC conditioning, decoded through the DAC
    # parse in the hierarchical marker walk
    enc = encode_jpeg_hier(rgb, levels=2, arith=True, restart_interval=5,
                           dc_cond=(1, 4))
    assert b"\xff\xcc" in enc  # DAC emitted
    assert (decode_jpeg(enc) == rgb).all()

    # dc_cond without arith is a caller error
    with pytest.raises(ValueError):
        encode_jpeg_hier(rgb, arith=False, dc_cond=(0, 1))

    # truncated differential entropy data → ValueError, never a hang
    good = encode_jpeg_hier(rgb, levels=2, arith=True)
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])
    # a bare SOF15 without DHP is malformed, not a stub
    bare = (
        b"\xff\xd8\xff\xcf" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(bare)


def test_12bit_dct_decode():
    """12-bit extended sequential (SOF1) and progressive (SOF2):
    constant-block grays are DC-exact, RGB is within YCbCr rounding,
    progressive decodes bit-identical to baseline on the same
    coefficients, and uint16 comes back out."""
    from dstlr_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(53)
    blocks = rng.integers(0, 4096, (3, 4), dtype=np.uint16)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(img))
    assert out.dtype == np.uint16
    assert (out[..., 0] == img).all()

    rgbb = rng.integers(0, 4096, (2, 3, 3), dtype=np.uint16)
    rgb = np.repeat(np.repeat(rgbb, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(rgb))
    assert abs(out.astype(np.int64) - rgb.astype(np.int64)).max() <= 1

    arb = rng.integers(0, 4096, (20, 28), dtype=np.uint16)
    base = decode_jpeg(encode_jpeg(arb))
    prog = decode_jpeg(encode_jpeg_progressive(arb))
    assert base.dtype == prog.dtype == np.uint16
    assert (base == prog).all()
    c = rng.integers(0, 4096, (17, 9, 3), dtype=np.uint16)
    assert (
        decode_jpeg(encode_jpeg_progressive(c, subsample="420",
                                            restart_interval=3))
        == decode_jpeg(encode_jpeg(c, subsample="420", restart_interval=3))
    ).all()

    # out-of-range samples stay rejected
    with pytest.raises(ValueError):
        encode_jpeg(np.full((8, 8), 4096, np.uint16))


def test_12bit_arithmetic_equals_huffman():
    """12-bit SOF9/SOF10: the QM coder's magnitude chains are
    category-unbounded, so 12-bit needs no new models — decode must
    equal the 12-bit Huffman twins bit-for-bit on the same quantized
    coefficients."""
    from dstlr_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(71)
    img = rng.integers(0, 4096, size=(20, 28), dtype=np.uint16)
    base = decode_jpeg(encode_jpeg(img))
    a = decode_jpeg(encode_jpeg_arith(img))
    assert a.dtype == np.uint16 and (a == base).all()
    assert (decode_jpeg(encode_jpeg_progressive_arith(img)) == base).all()
    rgb = rng.integers(0, 4096, size=(17, 9, 3), dtype=np.uint16)
    assert (
        decode_jpeg(encode_jpeg_arith(rgb, subsample="420",
                                      restart_interval=3,
                                      dc_cond=(1, 3), ac_kx=9))
        == decode_jpeg(encode_jpeg(rgb, subsample="420",
                                   restart_interval=3))
    ).all()


def test_multiscan_sequential_equals_interleaved():
    """T.81 multi-scan sequential files: one scan per component (real
    block grid, no MCU pads), partial interleaves, restarts, and
    12-bit all decode bit-identical to the single-scan interleaved
    encoding of the same coefficients."""
    from dstlr_spark.operators.jpeg import encode_jpeg_multiscan

    rng = np.random.default_rng(59)
    for shape, sub in [((24, 40), "444"), ((17, 9, 3), "444"),
                       ((21, 35, 3), "420")]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert (decode_jpeg(encode_jpeg_multiscan(img, subsample=sub))
                == base).all(), (shape, sub)
    img = rng.integers(0, 256, size=(21, 35, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample="420"))
    assert (decode_jpeg(encode_jpeg_multiscan(
        img, subsample="420", groups=[(1, 2), (3,)])) == base).all()
    assert (decode_jpeg(encode_jpeg_multiscan(
        img, subsample="420", restart_interval=3)) == base).all()
    img12 = rng.integers(0, 4096, size=(20, 28, 3), dtype=np.uint16)
    assert (decode_jpeg(encode_jpeg_multiscan(img12))
            == decode_jpeg(encode_jpeg(img12))).all()


def test_multiscan_malformed_contract():
    from dstlr_spark.operators.jpeg import encode_jpeg_multiscan

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    good = encode_jpeg_multiscan(img)
    # drop the final scan (find its SOS) → EOI with a missing component
    last_sos = good.rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(good[:last_sos] + b"\xff\xd9")
    # scan referencing a component id the frame does not declare
    sos_at = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos_at + 5] = 9  # first scan's component selector
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # invalid groups on the encoder side
    with pytest.raises(ValueError):
        encode_jpeg_multiscan(img, groups=[(1, 2)])


def test_cmyk_and_ycck_decode():
    """4-component Adobe JPEGs: solid stored-CMYK frames decode to the
    closed-form RGB = round(c̃·k̃/255) exactly (DC-exact channels at
    quant=1), YCCK agrees with direct CMYK within YCbCr rounding,
    arbitrary content stays within the pinned tolerance, 12-bit
    returns uint16, and an APP14 transform byte of 0 on a 3-component
    frame means components-are-RGB (no YCbCr inverse)."""
    from dstlr_spark.operators.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(67)
    for color in ((255, 255, 255, 255), (200, 10, 30, 128),
                  (0, 0, 0, 0), (13, 250, 99, 201)):
        img = np.zeros((16, 24, 4), np.uint8)
        img[:] = color
        out = decode_jpeg(encode_jpeg_cmyk(img))
        exp = [round(color[i] * color[3] / 255) for i in range(3)]
        assert (out == np.array(exp, np.uint8)).all(), color
        o2 = decode_jpeg(encode_jpeg_cmyk(img, ycck=True)).astype(int)
        assert abs(out.astype(int) - o2).max() <= 2, color
    img = rng.integers(0, 256, size=(21, 35, 4), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_cmyk(img, restart_interval=5)).astype(int)
    exp = np.round(img[..., :3].astype(float) * img[..., 3:4].astype(float)
                   / 255)
    assert abs(out - exp).max() <= 2
    img12 = rng.integers(0, 4096, size=(16, 16, 4), dtype=np.uint16)
    assert decode_jpeg(encode_jpeg_cmyk(img12)).dtype == np.uint16

    # 3-component APP14 transform 0: stored components ARE RGB
    solid = np.zeros((8, 16, 3), np.uint8)
    solid[:] = (10, 200, 30)
    plain = encode_jpeg(solid)
    app14_rgb = (
        b"\xff\xee" + struct.pack(">H", 2 + 12)
        + b"Adobe" + struct.pack(">H", 0x65)
        + struct.pack(">HH", 0, 0) + bytes([0])
    )
    tagged = plain[:2] + app14_rgb + plain[2:]
    out = decode_jpeg(tagged)
    # the stored planes are the JFIF forward transform of the color
    r, g, bch = 10.0, 200.0, 30.0
    y = round(0.299 * r + 0.587 * g + 0.114 * bch)
    cb = round(-0.168736 * r - 0.331264 * g + 0.5 * bch + 128)
    cr = round(0.5 * r - 0.418688 * g - 0.081312 * bch + 128)
    assert (out == np.array([y, cb, cr], np.uint8)).all()

    # 4-component DHP now parses (lossless CMYK pyramids decode), so a
    # SOF relabeled as DHP leaves the hierarchy with no frame before
    # SOS — malformed, not a stub
    good = encode_jpeg_cmyk(np.zeros((8, 8, 4), np.uint8))
    sof_at = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 1] = 0xDE  # pretend the SOF is a DHP
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_4comp_all_modes_agree():
    """4-component CMYK decodes under EVERY implemented mode pair:
    sequential/progressive × Huffman/arithmetic and multi-scan forms
    are bit-identical (same quantized coefficients), and the lossless
    family — Huffman, arithmetic, and both multi-scan forms — lands
    the exact closed-form RGB = round(c̃·k̃/255) of the planted
    planes."""
    from dstlr_spark.operators.jpeg import (
        encode_jpeg_cmyk,
        encode_jpeg_lossless,
        encode_jpeg_multiscan,
        encode_jpeg_progressive,
    )
    from dstlr_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_lossless_arith,
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(89)
    cmyk = rng.integers(0, 256, size=(21, 35, 4), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_cmyk(cmyk))
    for enc in (
        lambda a: encode_jpeg(a),
        lambda a: encode_jpeg_arith(a),
        lambda a: encode_jpeg_progressive(a),
        lambda a: encode_jpeg_progressive_arith(a),
        lambda a: encode_jpeg_multiscan(a),
        lambda a: encode_jpeg_arith(a, groups=[(1, 3), (2,), (4,)]),
    ):
        assert (decode_jpeg(enc(cmyk)) == base).all()
    exp = np.clip(
        np.round(cmyk[..., :3].astype(float) * cmyk[..., 3:4].astype(float)
                 / 255), 0, 255
    ).astype(np.uint8)
    for enc in (
        lambda a: encode_jpeg_lossless(a, predictor=4),
        lambda a: encode_jpeg_lossless_arith(a, predictor=4),
        lambda a: encode_jpeg_lossless(a, groups=[(1,), (2,), (3,), (4,)]),
        lambda a: encode_jpeg_lossless_arith(a, groups=[(2, 4), (1,), (3,)]),
    ):
        assert (decode_jpeg(enc(cmyk)) == exp).all()
    cmyk12 = rng.integers(0, 4096, size=(16, 16, 4), dtype=np.uint16)
    assert (decode_jpeg(encode_jpeg_arith(cmyk12))
            == decode_jpeg(encode_jpeg(cmyk12))).all()


def test_lossless_multiscan_exact():
    """Multi-scan lossless files (each component group its own
    Annex-H scan) reconstruct exactly — component orders, partial
    interleaves, restarts, 16-bit, and point transforms — and a file
    missing a component scan raises ValueError at EOI."""
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(73)
    rgb = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for groups in ([(1,), (2,), (3,)], [(1, 2), (3,)], [(3,), (1, 2)]):
        out = decode_jpeg(encode_jpeg_lossless(rgb, predictor=5,
                                               groups=groups))
        assert (out == rgb).all(), groups
    g16 = rng.integers(0, 65536, size=(9, 17), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(g16, predictor=1, groups=[(1,)]))
    assert out.dtype == np.uint16 and (out[..., 0] == g16).all()
    assert (decode_jpeg(encode_jpeg_lossless(
        rgb, predictor=7, restart_interval=4, groups=[(1,), (2,), (3,)]))
        == rgb).all()
    assert (decode_jpeg(encode_jpeg_lossless(
        rgb, predictor=4, point_transform=2, groups=[(1,), (2,), (3,)]))
        == (rgb >> 2) << 2).all()
    enc = encode_jpeg_lossless(rgb, groups=[(1,), (2,), (3,)])
    last = enc.rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[:last] + b"\xff\xd9")
    with pytest.raises(ValueError):
        encode_jpeg_lossless(rgb, groups=[(1, 2)])


def test_arith_multiscan_equals_huffman():
    """Multi-scan sequential ARITHMETIC files (each scan a fresh QM
    stream over its component group) decode bit-identical to the
    Huffman interleaved twin — groupings, partial interleaves,
    restarts, DAC conditioning, 12-bit — and a missing component scan
    raises ValueError at EOI."""
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(79)
    for shape, sub in [((24, 40), "444"), ((17, 9, 3), "444"),
                       ((21, 35, 3), "420")]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        groups = [(1,)] if img.ndim == 2 else [(1,), (2,), (3,)]
        assert (decode_jpeg(encode_jpeg_arith(img, subsample=sub,
                                              groups=groups))
                == base).all(), (shape, sub)
    img = rng.integers(0, 256, size=(21, 35, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample="420"))
    assert (decode_jpeg(encode_jpeg_arith(
        img, subsample="420", groups=[(1, 2), (3,)])) == base).all()
    assert (decode_jpeg(encode_jpeg_arith(
        img, subsample="420", restart_interval=3,
        groups=[(1,), (2,), (3,)])) == base).all()
    assert (decode_jpeg(encode_jpeg_arith(
        img, subsample="420", dc_cond=(1, 3), ac_kx=9,
        groups=[(1,), (2,), (3,)])) == base).all()
    img12 = rng.integers(0, 4096, size=(20, 28, 3), dtype=np.uint16)
    assert (decode_jpeg(encode_jpeg_arith(img12, groups=[(1,), (2,), (3,)]))
            == decode_jpeg(encode_jpeg(img12))).all()
    enc = encode_jpeg_arith(img, groups=[(1,), (2,), (3,)])
    last = enc.rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[:last] + b"\xff\xd9")
    with pytest.raises(ValueError):
        encode_jpeg_arith(img, groups=[(1, 2)])


def test_arith_lossless_multiscan_exact():
    """Multi-scan lossless-ARITHMETIC files (per-group fresh QM
    streams under the H.1.2 gradient-conditioned model) reconstruct
    exactly across groupings, restarts, 16-bit, point transforms and
    DAC conditioning, and share the Huffman twin's
    missing-component-scan ValueError."""
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(83)
    rgb = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for groups in ([(1,), (2,), (3,)], [(1, 2), (3,)], [(3,), (1, 2)]):
        assert (decode_jpeg(encode_jpeg_lossless_arith(
            rgb, predictor=5, groups=groups)) == rgb).all(), groups
    g16 = rng.integers(0, 65536, size=(9, 17), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless_arith(g16, predictor=1,
                                                 groups=[(1,)]))
    assert out.dtype == np.uint16 and (out[..., 0] == g16).all()
    assert (decode_jpeg(encode_jpeg_lossless_arith(
        rgb, predictor=7, restart_interval=4, groups=[(1,), (2,), (3,)]))
        == rgb).all()
    assert (decode_jpeg(encode_jpeg_lossless_arith(
        rgb, predictor=4, point_transform=2, dc_cond=(1, 2),
        groups=[(1,), (2,), (3,)])) == (rgb >> 2) << 2).all()
    enc = encode_jpeg_lossless_arith(rgb, groups=[(1,), (2,), (3,)])
    last = enc.rfind(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[:last] + b"\xff\xd9")


def test_hierarchical_cmyk_exact():
    """A lossless CMYK pyramid reconstructs exact planes at full
    resolution and converts by the shared closed-form
    RGB = round(c̃·k̃/255)."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(97)
    cmyk = rng.integers(0, 256, size=(11, 13, 4), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hier(cmyk, levels=3))
    exp = np.clip(
        np.round(cmyk[..., :3].astype(float) * cmyk[..., 3:4].astype(float)
                 / 255), 0, 255
    ).astype(np.uint8)
    assert (out == exp).all()


def _ycbcr_roundtrip_expected(rgb):
    """The closed-form the DCT-hierarchy value gate pins: forward
    rounded YCbCr (what encode_jpeg_hier_dct stores) then the decoder's
    JFIF inverse — exact when the stored planes reconstruct exactly."""
    r, g, bch = (rgb[..., i].astype(float) for i in range(3))
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * bch), 0, 255)
    cb = np.clip(
        np.round(-0.168736 * r - 0.331264 * g + 0.5 * bch + 128), 0, 255
    )
    cr = np.clip(
        np.round(0.5 * r - 0.418688 * g - 0.081312 * bch + 128), 0, 255
    )
    rr = y + 1.402 * (cr - 128)
    gg = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    bb = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([rr, gg, bb], 2)), 0, 255).astype(
        np.uint8
    )


def test_hierarchical_dct_exact_gates():
    """DCT-mode hierarchies (SOF0/SOF9 first frame + SOF5/SOF13
    differentials): solid color decodes exactly (all diffs zero, DC
    exact at quant=1); arith ≡ Huffman bit-equality on the same
    quantized coefficients; and T.81 J.5's closing lossless
    differential frame (SOF7/SOF15) makes the whole hierarchy EXACT
    against the closed-form stored-domain round trip — the value gate
    for the family."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct

    rng = np.random.default_rng(240)

    solid = np.zeros((24, 32, 3), np.uint8)
    solid[:] = (37, 180, 92)
    for arith in (False, True):
        out = decode_jpeg(encode_jpeg_hier_dct(solid, levels=3, arith=arith))
        assert (out == solid).all(), arith

    img = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_hier_dct(img, levels=2))
    alt = decode_jpeg(encode_jpeg_hier_dct(img, levels=2, arith=True))
    assert (base == alt).all()  # same coefficients, both entropy layers
    assert abs(base.astype(int) - img.astype(int)).max() <= 3

    # J.5 exactness: gray (stored == pixels) and RGB (closed form),
    # both layers, with restart intervals in every frame
    gray = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, (18, 25, 3), dtype=np.uint8)
    exp = _ycbcr_roundtrip_expected(rgb)
    for arith in (False, True):
        out = decode_jpeg(
            encode_jpeg_hier_dct(gray, levels=3, arith=arith,
                                 final_lossless=True)
        )
        assert (out[..., 0] == gray).all(), arith
        out = decode_jpeg(
            encode_jpeg_hier_dct(rgb, levels=2, arith=arith,
                                 final_lossless=True, restart_interval=6)
        )
        assert (out == exp).all(), arith

    # non-unit quant table still reconstructs within the pinned band
    q2 = np.full((8, 8), 2, np.int32)
    out = decode_jpeg(encode_jpeg_hier_dct(img, levels=2, quant=q2))
    assert abs(out.astype(int) - img.astype(int)).max() <= 6
    # ...and stays exact once the lossless closer corrects it
    out = decode_jpeg(
        encode_jpeg_hier_dct(rgb, levels=2, quant=q2, final_lossless=True)
    )
    assert (out == exp).all()


def test_hierarchical_dct_contract():
    """Exception contract around the DCT-hierarchy walk: a sequential
    scan header relabeled into a progressive frame is malformed
    (Ss=0, Se=63 mixes the DC and AC bands), truncation is
    ValueError, uint16 input is rejected by the encoder, and a DCT
    frame with no scan is malformed."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct

    rng = np.random.default_rng(241)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    good = encode_jpeg_hier_dct(img, levels=2)

    # SOF0 → SOF2 relabel: progressive frames DECODE in a hierarchy
    # now, so the failure moves to the scan header — the full-band
    # sequential scan is invalid progressive grammar (ValueError)
    sof_at = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))

    # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(good[:80])

    # encoder is 8-bit only
    with pytest.raises(ValueError):
        encode_jpeg_hier_dct(
            rng.integers(0, 4096, (8, 8), dtype=np.uint16)
        )

    # a differential DCT frame whose dims differ from the reference
    sof5_at = good.find(b"\xff\xc5")
    bad = bytearray(good)
    bad[sof5_at + 6] += 1  # bump frame height low byte
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_hierarchical_progressive_exact_gates():
    """Progressive frames inside a hierarchy (SOF2/SOF10 first frame,
    SOF6/SOF14 differentials) — the LAST JPEG frame-type family. The
    emitter writes the SAME quantized blocks as the sequential
    hierarchy through a full progressive scan script, so the gates
    are exact: (1) solid color decodes exactly, both entropy layers;
    (2) decode(progressive hierarchy) == decode(sequential hierarchy)
    BIT-FOR-BIT — gray and RGB, Huffman and arithmetic, restarts,
    deeper pyramids, non-default successive-approximation precisions
    and band splits; (3) T.81 J.5's closing lossless differential
    frame keeps the whole progressive pyramid exact against the
    closed-form stored-domain round trip."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct

    rng = np.random.default_rng(242)

    solid = np.zeros((24, 32, 3), np.uint8)
    solid[:] = (37, 180, 92)
    for arith in (False, True):
        out = decode_jpeg(
            encode_jpeg_hier_dct(solid, levels=3, arith=arith,
                                 progressive=True)
        )
        assert (out == solid).all(), arith

    gray = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, (21, 35, 3), dtype=np.uint8)
    for img in (gray, rgb):
        for arith in (False, True):
            seq = decode_jpeg(encode_jpeg_hier_dct(img, levels=2,
                                                   arith=arith))
            pro = decode_jpeg(
                encode_jpeg_hier_dct(img, levels=2, arith=arith,
                                     progressive=True)
            )
            assert (seq == pro).all(), (img.shape, arith)

    # restarts in every scan + the J.5 closer: exact closed form
    exp = _ycbcr_roundtrip_expected(rgb)
    for arith in (False, True):
        out = decode_jpeg(
            encode_jpeg_hier_dct(rgb, levels=3, arith=arith,
                                 progressive=True, final_lossless=True,
                                 restart_interval=5)
        )
        assert (out == exp).all(), arith

    # deeper successive approximation (negative differential DC rides
    # the two's-complement refinement OR) and non-default band splits
    seq = decode_jpeg(encode_jpeg_hier_dct(rgb, levels=2))
    out = decode_jpeg(
        encode_jpeg_hier_dct(rgb, levels=2, progressive=True,
                             dc_al=2, ac_al=2,
                             bands=((1, 2), (3, 20), (21, 63)))
    )
    assert (out == seq).all()
    seqa = decode_jpeg(encode_jpeg_hier_dct(rgb, levels=2, arith=True))
    out = decode_jpeg(
        encode_jpeg_hier_dct(rgb, levels=2, arith=True, progressive=True,
                             dc_al=3, ac_al=2, bands=((1, 63),),
                             restart_interval=3)
    )
    assert (out == seqa).all()

    # invalid band / precision are encoder-side ValueErrors
    with pytest.raises(ValueError):
        encode_jpeg_hier_dct(rgb, progressive=True, bands=((0, 63),))
    with pytest.raises(ValueError):
        encode_jpeg_hier_dct(rgb, progressive=True, dc_al=14)


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(2, 24),
    h=st.integers(2, 20),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    ri=st.integers(0, 2),
    levels=st.integers(1, 3),
    arith=st.booleans(),
)
def test_fuzz_hierarchical_progressive_exact(
    w, h, seed, color, ri, levels, arith
):
    """Any geometry/levels/restarts, both entropy layers: the
    PROGRESSIVE pyramid with the J.5 lossless closer lands the exact
    closed-form stored-domain round trip (the sequential fuzz gate's
    twin over the SOF2/6/10/14 frame family)."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct

    if (1 << (levels - 1)) > max(h, w):
        levels = 1
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg_hier_dct(
            img, levels=levels, arith=arith, restart_interval=ri,
            progressive=True, final_lossless=True,
        )
    )
    if color:
        assert (out == _ycbcr_roundtrip_expected(img)).all()
    else:
        assert (out[..., 0] == img).all()


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(2, 24),
    h=st.integers(2, 20),
    seed=st.integers(0, 2**31),
    color=st.booleans(),
    ri=st.integers(0, 2),
    levels=st.integers(1, 3),
    arith=st.booleans(),
)
def test_fuzz_hierarchical_dct_lossless_close(
    w, h, seed, color, ri, levels, arith
):
    """Any geometry/levels/restarts, both entropy layers: the DCT
    pyramid with the J.5 lossless closer lands the exact closed-form
    stored-domain round trip."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct

    if (1 << (levels - 1)) > max(h, w):
        levels = 1
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg_hier_dct(
            img, levels=levels, arith=arith, restart_interval=ri,
            final_lossless=True,
        )
    )
    if color:
        assert (out == _ycbcr_roundtrip_expected(img)).all()
    else:
        assert (out[..., 0] == img).all()


def test_two_component_frames_every_mode():
    """T.81-legal 2-component frames decode in every mode under the
    gray+aux-drop convention (component 0 replicates to RGB, the
    auxiliary plane is dropped — the PNG gray+alpha convention):
    lossless is EXACT at 8 and 16 bits; sequential DCT decodes
    bit-identically to the gray twin of component 0; progressive and
    arithmetic decode bit-identically to the sequential twin. A
    5-component frame is malformed (ValueError), not a stub."""
    from dstlr_spark.operators.jpeg import (
        encode_jpeg_lossless,
        encode_jpeg_multiscan,
        encode_jpeg_progressive,
    )
    from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(5)
    img2 = rng.integers(0, 256, (17, 13, 2)).astype(np.uint8)
    exp = np.repeat(img2[..., :1], 3, axis=2)
    for pred in (1, 4, 7):
        assert (
            decode_jpeg(encode_jpeg_lossless(img2, predictor=pred)) == exp
        ).all()
    img16 = rng.integers(0, 65536, (9, 11, 2)).astype(np.uint16)
    got = decode_jpeg(encode_jpeg_lossless(img16, predictor=7))
    assert got.dtype == np.uint16
    assert (got == np.repeat(img16[..., :1], 3, axis=2)).all()

    seq = decode_jpeg(encode_jpeg(img2))
    assert (seq == decode_jpeg(encode_jpeg(img2[:, :, 0]))).all()
    assert (decode_jpeg(encode_jpeg_progressive(img2)) == seq).all()
    assert (decode_jpeg(encode_jpeg_arith(img2)) == seq).all()
    assert (
        decode_jpeg(encode_jpeg_multiscan(img2, groups=[[1], [2]])) == seq
    ).all()

    sof = (
        b"\xff\xd8\xff\xc0"
        + struct.pack(">H", 2 + 6 + 3 * 5)
        + struct.pack(">BHHB", 8, 4, 4, 5)
        + bytes(15)
    )
    with pytest.raises(ValueError):
        decode_jpeg(sof)


def test_two_component_hierarchical_exact():
    """2-component frames inside an Annex-J lossless hierarchy decode
    exactly under the gray+aux-drop convention, both entropy layers,
    multi-level pyramids included."""
    from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier

    rng = np.random.default_rng(3)
    img2 = rng.integers(0, 256, (12, 10, 2)).astype(np.uint8)
    exp = np.repeat(img2[..., :1], 3, axis=2)
    for levels in (1, 3):
        assert (decode_jpeg(encode_jpeg_hier(img2, levels=levels)) == exp).all()
    assert (
        decode_jpeg(encode_jpeg_hier(img2, levels=2, arith=True)) == exp
    ).all()
