"""Baseline JPEG (ITU-T T.81) codec — pure NumPy + stdlib, no imaging
library.

Closes the last image-codec stub in :mod:`dstlr_spark.operators.
multimodal.decode_rgb_bytes` (reference parity anchor: the reference
pipeline treats media bytes as opaque payloads — SURVEY §2.12 makes
decode a first-class curation operator). Decoder scope is baseline
sequential DCT, the format ~90 % of web JPEGs use:

- SOF0 (baseline) and SOF1 (extended sequential — identical decode
  path at 8-bit precision), grayscale or YCbCr, integer-ratio chroma
  subsampling (4:4:4, 4:2:2, 4:2:0, 4:1:1 …);
- multi-segment DQT (8- and 16-bit precision) / DHT, DRI + RSTn
  restart-marker resync with DC-predictor reset, 0xFF00 byte
  unstuffing;
- dequant → de-zigzag → exact float IDCT (the 8×8 DCT-II basis as one
  matrix product — NumPy's GEMM, no per-pixel Python) → level shift →
  JFIF YCbCr→RGB.

Progressive (SOF2), arithmetic coding (SOF9+), hierarchical, 12-bit
precision, and CMYK raise ``NotImplementedError`` — genuinely
different entropy/scan machinery. A MALFORMED stream (truncated
entropy data, bad marker, invalid Huffman code, inconsistent
dimensions) raises ``ValueError`` so the per-doc isolation wrapper in
``decode_image_np`` can skip it — the same exception contract every
other decoder in this package pins (tests/test_multimodal.py,
"exception contract").

JPEG is lossy, so unlike BMP/PNG/GIF/PPM it cannot join the
format-blind ``mm_media_decode`` gate corpus (the analytic oracle
checks EXACT planted values; DCT quantization cannot reproduce an
arbitrary planted array bit-for-bit). It is gated instead by the
DC-exact analytic construction in tests/test_jpeg.py: constant 8×8
blocks survive quantize→dequantize→IDCT EXACTLY (every AC is an exact
float zero and the DC rounds to the planted integer), so those
round-trips assert equality, not tolerance.
"""

from __future__ import annotations

import struct

#: zigzag scan order: position k in the entropy-coded sequence lives at
#: raster offset _ZIGZAG[k] of the 8×8 block (T.81 Figure A.6)
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)


def _dct_basis():
    """The 8×8 DCT-II basis A with A[u, n] = c(u)/2 · cos((2n+1)uπ/16):
    inverse transform is Aᵀ·F·A, forward is A·f·Aᵀ — both one GEMM."""
    import numpy as np

    u = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * n + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2.0)
    return a


def _entropy_segments(b: bytes, pos: int):
    """Pre-scan the entropy-coded data from SOS: unstuff 0xFF00 and
    split at RSTn markers — one pass, so the bit reader below never
    has to test for stuffing per byte. Returns [(data, closing_rst)]
    where closing_rst is the 0–7 index of the RSTn that ENDED the
    segment (None for the final segment, which ends at a real
    marker / stream end)."""
    segs = []
    cur = bytearray()
    i, n = pos, len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = b[i + 1]
        if m == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i += 2
            continue
        if 0xD0 <= m <= 0xD7:
            segs.append((bytes(cur), m - 0xD0))
            cur = bytearray()
            i += 2
            continue
        break  # real marker ends the scan
    segs.append((bytes(cur), None))
    return segs


class _BitReader:
    """MSB-first bit reader over one pre-unstuffed entropy segment:
    an integer accumulator refilled a byte at a time, 1s-padding past
    the segment end (T.81 F.2.2.5) bounded at 7 CONSUMED pad bits —
    more means the stream is truncated, not padded."""

    __slots__ = ("d", "pos", "acc", "n", "fake")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.fake = 0  # pad bits appended past the data end

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos < len(self.d):
                self.acc = (self.acc << 8) | self.d[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF
                self.fake += 8
            self.n += 8

    def _check(self) -> None:
        # consumed = bits ever loaded − bits still buffered; > 7 pad
        # bits consumed can never happen in a well-formed stream
        if self.pos * 8 + self.fake - self.n > len(self.d) * 8 + 7:
            raise ValueError("JPEG entropy stream truncated")

    def receive(self, nb: int) -> int:
        if not nb:
            return 0
        self._fill(nb)
        self.n -= nb
        v = (self.acc >> self.n) & ((1 << nb) - 1)
        self.acc &= (1 << self.n) - 1
        self._check()
        return v


def _build_huffman(counts: bytes, symbols: bytes):
    """(BITS, HUFFVAL) → canonical decode tables (T.81 Annex C): a
    256-entry fast path resolving every code of ≤8 bits in one index,
    plus the {(length, code): symbol} map for longer codes. Rejects
    over-subscribed length counts."""
    table: dict[tuple[int, int], int] = {}
    fast: list = [None] * 256
    code = 0
    k = 0
    for length in range(1, 17):
        cnt = counts[length - 1]
        if code + cnt > (1 << length):
            raise ValueError("JPEG Huffman table over-subscribed")
        for _ in range(cnt):
            sym = symbols[k]
            table[(length, code)] = sym
            if length <= 8:
                lo = code << (8 - length)
                for f in range(lo, lo + (1 << (8 - length))):
                    fast[f] = (sym, length)
            code += 1
            k += 1
        code <<= 1
    return fast, table


def _huff_decode(br: _BitReader, tbl) -> int:
    fast, table = tbl
    br._fill(8)
    hit = fast[(br.acc >> (br.n - 8)) & 0xFF]
    if hit is not None:
        sym, ln = hit
        br.n -= ln
        br.acc &= (1 << br.n) - 1
        br._check()
        return sym
    br._fill(16)
    window = (br.acc >> (br.n - 16)) & 0xFFFF
    for length in range(9, 17):
        sym = table.get((length, window >> (16 - length)))
        if sym is not None:
            br.n -= length
            br.acc &= (1 << br.n) - 1
            br._check()
            return sym
    raise ValueError("JPEG invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received magnitude bits to a signed
    coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes):
    """Decode one baseline JPEG payload → (h, w, 3) uint8 RGB.

    Grayscale decodes to replicated RGB (the :func:`decode_rgb_bytes`
    contract every codec here shares); chroma planes upsample by
    integer repetition then crop to the frame. See the module
    docstring for scope and the exception contract.
    """
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtables: dict[int, object] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, H, V, tq), ...])
    restart_interval = 0
    pos = 2
    n = len(b)
    while True:
        if pos + 4 > n:
            raise ValueError("JPEG truncated before SOS")
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG expected marker at {pos}, got {b[pos]:#x}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / stray RST
            continue
        if marker == 0xD9:
            raise ValueError("JPEG EOI before any scan")
        if pos + 2 > n:
            raise ValueError("JPEG truncated segment length")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError("JPEG segment overruns stream")
        seg = b[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                s += 1
                if pq not in (0, 1) or tq > 3:
                    raise ValueError("JPEG DQT precision/id invalid")
                width = 2 if pq else 1
                if s + 64 * width > len(seg):
                    raise ValueError("JPEG DQT truncated")
                vals = (
                    np.frombuffer(seg, ">u2", count=64, offset=s)
                    if pq
                    else np.frombuffer(seg, np.uint8, count=64, offset=s)
                )
                q = np.zeros(64, np.int32)
                q[list(_ZIGZAG)] = vals  # de-zigzag to natural order
                qtables[tq] = q.reshape(8, 8)
                s += 64 * width
        elif marker == 0xC4:  # DHT (possibly several tables)
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                s += 1
                if tc > 1 or th > 3 or s + 16 > len(seg):
                    raise ValueError("JPEG DHT header invalid")
                counts = seg[s : s + 16]
                total = sum(counts)
                s += 16
                if s + total > len(seg):
                    raise ValueError("JPEG DHT truncated")
                htables[(tc, th)] = _build_huffman(counts, seg[s : s + total])
                s += total
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1: identical decode
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"STUB: JPEG {prec}-bit precision — baseline is 8-bit"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if not h or not w:
                raise ValueError(f"JPEG dimensions {w}x{h} invalid")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"STUB: JPEG {ncomp}-component (CMYK?) color"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "STUB: progressive JPEG (SOF2) — spectral-selection scans"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"STUB: JPEG SOF {marker:#x} (lossless/arithmetic/"
                "hierarchical modes)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG DRI truncated")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            scan = []
            ns = seg[0]
            if ns != len(frame[2]):
                raise NotImplementedError(
                    "STUB: JPEG multi-scan (non-interleaved) files"
                )
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 15))
            return _decode_scan(
                b, pos, frame, scan, qtables, htables, restart_interval
            )
        # APPn / COM / anything else: skip


def _decode_scan(b, pos, frame, scan, qtables, htables, restart_interval):
    import numpy as np

    h, w, comps = frame
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if min(hs) < 1 or min(vs) < 1 or hmax > 4 or vmax > 4:
        raise ValueError("JPEG sampling factors out of range")
    if any(hmax % f for f in hs) or any(vmax % f for f in vs):
        raise NotImplementedError(
            "STUB: non-integer chroma upsampling ratios"
        )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    basis = _dct_basis()
    planes = []
    tables = []
    for (cid, ch_, cv, tq), (scid, td, ta) in zip(comps, scan):
        if cid != scid:
            raise ValueError("JPEG scan component order differs from frame")
        if tq not in qtables:
            raise ValueError(f"JPEG missing quant table {tq}")
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("JPEG missing Huffman table for scan")
        # coefficient store: one row of 64 per block — the dequant,
        # IDCT and block→plane scatter all batch over it afterwards
        planes.append(
            np.zeros((mcus_y * cv, mcus_x * ch_, 64), np.float64)
        )
        tables.append((htables[(0, td)], htables[(1, ta)], qtables[tq]))
    segs = _entropy_segments(b, pos)
    if len(segs) > 1 and not restart_interval:
        raise ValueError("JPEG RST marker without a DRI segment")
    seg_i = 0
    br = _BitReader(segs[0][0])
    preds = [0] * len(comps)
    nmcu = mcus_x * mcus_y
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            closing = segs[seg_i][1]
            if closing is None or closing != (m // restart_interval - 1) % 8:
                raise ValueError("JPEG restart marker missing/out of sequence")
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG truncated at restart boundary")
            br = _BitReader(segs[seg_i][0])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, ch_, cv, tq) in enumerate(comps):
            dc_t, ac_t, q = tables[ci]
            for by in range(cv):
                for bx in range(ch_):
                    coef = [0.0] * 64  # plain list: scalar stores beat
                    # per-element ndarray indexing (same finding as the
                    # PNG Paeth loop in multimodal._unfilter)
                    t = _huff_decode(br, dc_t)
                    if t > 11:
                        raise ValueError("JPEG DC category > 11")
                    preds[ci] += _extend(br.receive(t), t)
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(br.receive(s), s)
                        k += 1
                    planes[ci][my * cv + by, mx * ch_ + bx] = coef
    out = []
    for ci, (cid, ch_, cv, tq) in enumerate(comps):
        nbr, nbc = planes[ci].shape[:2]
        q = tables[ci][2]
        # batched dequant + IDCT: ONE broadcast GEMM pair over every
        # block, then a transpose-reshape scatters blocks into the plane
        blk = planes[ci].reshape(-1, 8, 8) * q
        px = basis.T @ blk @ basis + 128.0
        p = (
            px.reshape(nbr, nbc, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nbr * 8, nbc * 8)
        )
        if ch_ != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch_, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder — fixture-side twin (tests only, like encode_bmp/encode_png)
# --------------------------------------------------------------------------

#: fixture Huffman tables: every symbol at code length 8, canonical
#: order — trivially valid (Kraft: 162/256 < 1), and the decoder builds
#: from DHT so it exercises the same path real Annex-K tables take.
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [16 * r + s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
)


def _fixed_table(symbols: bytes):
    counts = bytearray(16)
    counts[7] = len(symbols)  # all codes 8 bits long
    enc = {sym: (8, i) for i, sym in enumerate(symbols)}
    return bytes(counts), symbols, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(bw, coef_zz, pred, dc_enc, ac_enc) -> int:
    """Entropy-encode one zigzag-ordered quantized block; returns the
    new DC predictor."""
    dc = int(coef_zz[0])
    diff = dc - pred
    t = _category(diff)
    bw.write(dc_enc[t][1], dc_enc[t][0])
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(ac_enc[0xF0][1], ac_enc[0xF0][0])  # ZRL
            run -= 16
        s = _category(v)
        bw.write(ac_enc[16 * run + s][1], ac_enc[16 * run + s][0])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.write(ac_enc[0x00][1], ac_enc[0x00][0])  # EOB
    return dc


def encode_jpeg(img, quant=None, subsample="444", restart_interval=0) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    REAL baseline JPEG (SOF0) — the fixture-side twin of
    :func:`decode_jpeg`, pure NumPy forward DCT + the fixed-length-8
    canonical Huffman tables above. ``quant`` is an (8, 8) natural-
    order table (default all ones — maximum fidelity, which makes
    constant-block images round-trip EXACTLY); ``subsample`` is
    ``"444"`` or ``"420"`` (RGB only; 4:2:0 averages each 2×2 chroma
    neighborhood); ``restart_interval`` > 0 emits DRI + RSTn markers.
    """
    import numpy as np

    arr = np.asarray(img, np.float64)
    gray = arr.ndim == 2
    if quant is None:
        quant = np.ones((8, 8), np.int32)
    quant = np.asarray(quant, np.int32)
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [arr - 128.0]
    else:
        r, g, bch = arr[..., 0], arr[..., 1], arr[..., 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * bch)
        cb = np.round(-0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0)
        cr = np.round(0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0)
        cb = np.clip(cb, 0, 255)
        cr = np.clip(cr, 0, 255)
        if subsample == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
        elif subsample == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]

            def _avg2(p):
                hh = (p.shape[0] + 1) & ~1
                ww = (p.shape[1] + 1) & ~1
                q = np.zeros((hh, ww), np.float64)
                q[: p.shape[0], : p.shape[1]] = p
                if p.shape[0] < hh:
                    q[p.shape[0] :, : p.shape[1]] = p[-1:]
                if p.shape[1] < ww:
                    q[:, p.shape[1] :] = q[:, p.shape[1] - 1 : p.shape[1]]
                return np.round(
                    (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2]
                     + q[1::2, 1::2]) / 4.0
                )

            planes = [y - 128.0, _avg2(cb) - 128.0, _avg2(cr) - 128.0]
        else:
            raise ValueError(f"unsupported subsample {subsample!r}")
    h, w = arr.shape[:2]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    basis = _dct_basis()
    zz = list(_ZIGZAG)
    # pad each plane to its MCU grid by edge replication
    padded = []
    for (cid, ch_, cv, tq), p in zip(comps, planes):
        ph, pw = mcus_y * cv * 8, mcus_x * ch_ * 8
        q = np.zeros((ph, pw), np.float64)
        q[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < ph:
            q[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < pw:
            q[:, p.shape[1] :] = q[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(q)

    dc_counts, dc_syms, dc_enc = _fixed_table(_DC_SYMBOLS)
    ac_counts, ac_syms, ac_enc = _fixed_table(_AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")
    qzz = quant.reshape(-1)[zz].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qzz.tobytes()
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, ch_, cv, tq in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
        body = bytes([tc << 4]) + counts + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    nmcu = mcus_x * mcus_y
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            idx = (m // restart_interval - 1) % 8
            out += bytes([0xFF, 0xD0 + idx])
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (cid, ch_, cv, tq) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch_):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch_ + bx) * 8
                    blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    f = basis @ blk @ basis.T
                    qz = np.round(f / quant).astype(np.int64).reshape(-1)[zz]
                    preds[ci] = _encode_block(bw, qz, preds[ci], dc_enc, ac_enc)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
