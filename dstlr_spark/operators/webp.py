"""WebP-lossless (VP8L) decode/encode — pure Python/NumPy, zero deps.

VP8L (RFC 9649 §4) is the last widely-deployed LOSSLESS image format
missing from the dispatch: an LSB-first bitstream of canonical prefix
codes (DEFLATE-style, derived from code lengths — formula-derived,
not arbitrary assignments, so it satisfies the same
cross-validation bar as the canonical JPEG/FLAC code builders here),
LZ77 backward references over the flat ARGB pixel array, an optional
color cache, and four reversible transforms (predictor / color /
subtract-green / color-indexing with pixel bundling). Every step is
integer-exact, so the decoder joins the format-BLIND planted-pixel
oracle corpus (:func:`dstlr_spark.operators.multimodal.
decode_rgb_bytes` dispatches on ``RIFF…WEBPVP8L``).

Decoder surface (:func:`decode_webp`): simple and normal prefix
codes (code-length codes with 16/17/18 repeats and the max-symbol
cap), meta prefix codes (entropy image), color cache (1-11 bits),
all length/distance codes incl. the 120-entry 2-D distance map, all
14 predictor modes with the flat-array edge rules, the color
transform (signed ``>> 5`` cross-channel deltas), subtract-green,
and color-indexing with 1/2/4/8-per-byte pixel bundling. Lossy VP8
frames and the extended VP8X container raise NotImplementedError.

Encoder (:func:`encode_webp`) is the deterministic FIXTURE side:
real histogram→Huffman code-length headers, distance-1 run LZ77,
optional subtract-green / palette transforms and color cache, so
round-trips exercise the decode paths the gate corpus rides.

Contract: malformed input raises ValueError; real-but-unimplemented
features NotImplementedError; never struct.error/IndexError.

Scale shape: per-pixel Python op walk (sequential by construction,
like GIF-LZW/FLAC); the 100 TB axis is corpus parallelism — one
image per row, Arrow-batched, features reduced in-stage.
"""

from __future__ import annotations

import struct

# RFC 9649 §4.2.2: code-length-code read order, and the 120-entry
# (dx, dy) distance map for 2-D-local backward references.
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader (the VP8L convention; prefix-code BITS are
    accumulated MSB-first by the walker below, the DEFLATE layout)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated VP8L bitstream")
        v = 0
        p = self.pos
        for k in range(n):
            v |= ((self.data[(p + k) >> 3] >> ((p + k) & 7)) & 1) << k
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated VP8L bitstream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


def _canonical_codes(lengths):
    """Code lengths → {(length, code): symbol} under the DEFLATE
    canonical assignment (symbols of equal length coded in symbol
    order; shorter lengths first)."""
    max_len = max(lengths)
    if max_len > 15:
        raise ValueError("VP8L code length exceeds 15")
    count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    # completeness: a garbage header can describe an over/under-full
    # code; the walker below then fails with ValueError on lookup
    return table


class _PrefixCode:
    __slots__ = ("table", "single")

    def __init__(self, lengths=None, single=None):
        self.single = single
        self.table = _canonical_codes(lengths) if lengths is not None else {}

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        acc, ln = 0, 0
        while ln <= 15:
            acc = (acc << 1) | br.read_bit()
            ln += 1
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        if num == 1:
            if sym0 >= alphabet:
                raise ValueError("VP8L simple-code symbol out of range")
            return _PrefixCode(single=sym0)
        sym1 = br.read(8)
        if sym0 >= alphabet or sym1 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        if sym0 == sym1:
            raise ValueError("VP8L simple code repeats a symbol")
        lengths = [0] * alphabet
        lengths[sym0] = lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal code: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    if not any(clc_lengths):
        raise ValueError("VP8L empty code-length code")
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # max-symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if sym >= alphabet:
                    raise ValueError("VP8L repeat overflows alphabet")
                lengths[sym] = prev
                sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise ValueError("VP8L repeat overflows alphabet")
    if sum(1 for x in lengths if x) == 1:
        # one-symbol code: read ZERO bits per symbol (the libwebp
        # BuildHuffmanTable special case, mirrored by the encoder)
        return _PrefixCode(
            single=next(i for i, x in enumerate(lengths) if x)
        )
    if not any(lengths):
        raise ValueError("VP8L prefix code with no symbols")
    return _PrefixCode(lengths)


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix symbol → value (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _read_groups(br: _BitReader, n_groups: int, cache_size: int):
    groups = []
    for _ in range(n_groups):
        g = (
            _read_prefix_code(br, 256 + 24 + cache_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        )
        groups.append(g)
    return groups


def _decode_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """Decode one spatially-coded image → flat list of ARGB uint32
    (length w·h). Sub-images (transforms, entropy image, palette) set
    ``allow_meta=False`` per spec."""
    # RFC 9649 §4.3 order: color-cache-info FIRST, then the
    # meta-prefix bit (libwebp DecodeImageStream → ReadHuffmanCodes)
    cache_size = 0
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L cache bits {cache_bits} out of range")
        cache_size = 1 << cache_bits

    meta = None
    meta_bits = 0
    if allow_meta and br.read_bit():
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_image(br, mw, mh, False)
        n_groups = 0
        for px in meta:
            n_groups = max(n_groups, ((px >> 8) & 0xFFFF))
        n_groups += 1
    else:
        n_groups = 1
    groups = _read_groups(br, n_groups, cache_size)
    cache = [0] * cache_size

    n_px = w * h
    out = [0] * n_px
    i = 0
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta else 0

    def group_for(i):
        if meta is None:
            return groups[0]
        x, y = i % w, i // w
        mpx = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
        return groups[(mpx >> 8) & 0xFFFF]

    def cache_insert(argb):
        if cache_size:
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while i < n_px:
        gcodes = group_for(i)
        g = gcodes[0].read(br)
        if g < 256:  # literal
            r = gcodes[1].read(br)
            b = gcodes[2].read(br)
            a = gcodes[3].read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            out[i] = argb
            cache_insert(argb)
            i += 1
        elif g < 280:  # backward reference
            length = _lz77_value(g - 256, br)
            dist_code = _lz77_value(gcodes[4].read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n_px:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                argb = out[i - dist]
                out[i] = argb
                cache_insert(argb)
                i += 1
        else:  # color-cache hit
            idx = g - 280
            if idx >= cache_size:
                raise ValueError("VP8L cache symbol without cache")
            out[i] = cache[idx]
            i += 1
    return out


def _avg2(a, b):
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(l, t, tl):  # noqa: E741
    p_alpha = ((l >> 24) & 0xFF) + ((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - ((l >> 24) & 0xFF)) + abs(p_red - ((l >> 16) & 0xFF))
        + abs(p_green - ((l >> 8) & 0xFF)) + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - ((t >> 24) & 0xFF)) + abs(p_red - ((t >> 16) & 0xFF))
        + abs(p_green - ((t >> 8) & 0xFF)) + abs(p_blue - (t & 0xFF))
    )
    return l if pl < pt else t


def _clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _cas_full(l, t, tl):  # noqa: E741
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= _clamp(v) << sh
    return out


def _cas_half(avg, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        # C integer division truncates toward zero; Python // floors —
        # they differ on negative odd deltas
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << sh
    return out


def _add_px(p, q):
    """Per-channel mod-256 add of two packed ARGB values."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) + ((q >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _apply_predictor(px, w, h, pred_img, bits):
    pw = (w + (1 << bits) - 1) >> bits
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]
        elif x == 0:
            pred = px[i - w]
        else:
            mode = (pred_img[(y >> bits) * pw + (x >> bits)] >> 8) & 0xFF
            l = px[i - 1]  # noqa: E741
            t = px[i - w]
            tl = px[i - w - 1]
            tr = px[i - w + 1]  # flat-array rule: x=w-1 wraps to row start
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = l
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(l, tr), t)
            elif mode == 6:
                pred = _avg2(l, tl)
            elif mode == 7:
                pred = _avg2(l, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(l, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(l, t, tl)
            elif mode == 12:
                pred = _cas_full(l, t, tl)
            elif mode == 13:
                pred = _cas_half(_avg2(l, t), tl)
            else:
                raise ValueError(f"VP8L predictor mode {mode} invalid")
        px[i] = _add_px(px[i], pred)
    return px


def _ct_delta(t, c):
    """ColorTransformDelta: signed int8 multiply, arithmetic >> 5."""
    t = t - 256 if t > 127 else t
    c = c - 256 if c > 127 else c
    return (t * c) >> 5


def _apply_color_transform(px, w, h, ct_img, bits):
    pw = (w + (1 << bits) - 1) >> bits
    for i in range(w * h):
        x, y = i % w, i // w
        cte = ct_img[(y >> bits) * pw + (x >> bits)]
        g2r = (cte) & 0xFF           # blue channel of the element
        g2b = (cte >> 8) & 0xFF      # green channel
        r2b = (cte >> 16) & 0xFF     # red channel
        v = px[i]
        a = (v >> 24) & 0xFF
        r = (v >> 16) & 0xFF
        g = (v >> 8) & 0xFF
        b = v & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        px[i] = (a << 24) | (r << 16) | (g << 8) | b
    return px


def _apply_subtract_green(px):
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        r = (((v >> 16) & 0xFF) + g) & 0xFF
        b = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b
    return px


def _apply_color_indexing(px, w, h, palette, packed_w, xbits):
    out = [0] * (w * h)
    n = len(palette)
    for i in range(w * h):
        x, y = i % w, i // w
        packed = px[y * packed_w + (x >> xbits)]
        idx = ((packed >> 8) & 0xFF)
        if xbits:
            per = 8 >> xbits  # bits per pixel within the green byte
            shift = (x & ((1 << xbits) - 1)) * per
            idx = (idx >> shift) & ((1 << per) - 1)
        if idx >= n:
            # spec: out-of-palette indices decode as black-ish zero;
            # libwebp clamps — we reject, the stricter contract
            raise ValueError("VP8L palette index out of range")
        out[i] = palette[idx]
    return out


def decode_webp(b: bytes):
    """REAL WebP-lossless decode → (h, w, 3) uint8 RGB (alpha decoded
    then dropped — the shared :func:`decode_rgb_bytes` rule)."""
    import numpy as np

    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    tag = b[12:16]
    if tag == b"VP8 ":
        raise NotImplementedError(
            "STUB: lossy VP8 WebP needs a full DCT video intra-frame "
            "decoder; only lossless VP8L decodes natively"
        )
    if tag == b"VP8X":
        raise NotImplementedError(
            "STUB: extended WebP container (VP8X: animation/EXIF/alpha "
            "chunks); plain VP8L streams decode natively"
        )
    if tag != b"VP8L":
        raise ValueError(f"unknown WebP chunk {tag!r}")
    ln = struct.unpack("<I", b[16:20])[0]
    payload = b[20 : 20 + ln]
    if len(payload) != ln:
        raise ValueError("truncated VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > 1 << 26:
        raise ValueError(f"VP8L dims {w}x{h} out of range")

    transforms = []
    seen = set()
    cur_w = w
    xbits = 0
    palette = None
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            pw = (cur_w + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            transforms.append(("pred", bits, _decode_image(br, pw, ph, False)))
        elif ttype == 1:  # color transform
            bits = 2 + br.read(3)
            pw = (cur_w + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            transforms.append(("color", bits, _decode_image(br, pw, ph, False)))
        elif ttype == 2:
            transforms.append(("sub_green",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            raw = _decode_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for v in raw:
                prev = _add_px(prev, v)
                palette.append(prev)
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            packed_w = (cur_w + (1 << xbits) - 1) >> xbits
            transforms.append(("index", palette, cur_w, packed_w, xbits))
            cur_w = packed_w

    px = _decode_image(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == "index":
            _, palette, full_w, packed_w, xbits = t
            px = _apply_color_indexing(px, full_w, h, palette, packed_w, xbits)
            cur_w = full_w
        elif t[0] == "sub_green":
            px = _apply_subtract_green(px)
        elif t[0] == "color":
            px = _apply_color_transform(px, cur_w, h, t[2], t[1])
        else:
            px = _apply_predictor(px, cur_w, h, t[2], t[1])

    arr = np.asarray(px, np.uint32).reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    return rgb


# --------------------------------------------------------------------------
# Fixture-side encoder
# --------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("bits", "nbits")

    def __init__(self):
        self.bits = bytearray()
        self.nbits = 0

    def write(self, v: int, n: int) -> None:  # LSB-first
        for k in range(n):
            if self.nbits & 7 == 0:
                self.bits.append(0)
            if (v >> k) & 1:
                self.bits[-1] |= 1 << (self.nbits & 7)
            self.nbits += 1

    def write_code(self, code: int, ln: int) -> None:  # MSB-first code bits
        for k in range(ln - 1, -1, -1):
            self.write((code >> k) & 1, 1)


def _huffman_lengths(freqs, max_len=15):
    """Frequencies → code lengths (≤ max_len). Simple Huffman +
    length-capping rebalance (counts here are small fixture
    histograms, never pathological)."""
    import heapq
    import itertools

    syms = [s for s, f in enumerate(freqs) if f]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    cnt = itertools.count()
    heap = [(freqs[s], next(cnt), (s,)) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, next(cnt), g1 + g2))
    while max(depth.values()) > max_len:
        # crude rebalance: flatten everything toward ceil(log2 n)
        import math

        flat = max(1, math.ceil(math.log2(len(syms))))
        for s in depth:
            depth[s] = min(max_len, max(flat, 1))
        break
    # Kraft fix-up: lengths from a Huffman tree always satisfy Kraft;
    # the flatten path may undershoot, which canonical assignment
    # tolerates only if exact — recompute greedily if needed
    kraft = sum(2 ** (max_len - depth[s]) for s in syms)
    if kraft > 2**max_len:
        raise ValueError("encoder produced an invalid code")
    out = [0] * len(freqs)
    for s, d in depth.items():
        out[s] = d
    return out


def _canon_from_lengths(lengths):
    """symbol → (code, length), by inverting the DECODER's canonical
    table — one shared assignment algorithm (and its >15-length
    guard), so encoder and decoder cannot drift."""
    return {
        sym: (code, ln)
        for (ln, code), sym in _canonical_codes(lengths).items()
    }


def _write_prefix_code(bw: _BitWriter, lengths):
    """Emit a prefix-code header. Uses the simple form for ≤2 symbols,
    else a literal (no 16/17/18 repeats) code-length-coded header."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return
    if len(used) == 2 and used[0] < 2 and used[1] < 256:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        bw.write(0, 1)
        bw.write(used[0], 1)
        bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal
    # limit the emitted symbol-length list to the last used symbol
    last = max(used) + 1
    clc_freq = [0] * 19
    for ln in lengths[:last]:
        clc_freq[ln] += 1
    clc_lengths = _huffman_lengths(clc_freq, max_len=7)
    # num_code_lengths must cover every nonzero clc slot in _CLC_ORDER
    need = 19
    while need > 4 and clc_lengths[_CLC_ORDER[need - 1]] == 0:
        need -= 1
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    clc_codes = _canon_from_lengths(clc_lengths)
    if last < len(lengths):
        # use the max-symbol cap so we stop after `last` entries
        bw.write(1, 1)
        nbits = 2
        while (1 << nbits) < last - 1:
            nbits += 2
        if nbits > 14:
            raise ValueError("max-symbol cap overflow")
        bw.write((nbits - 2) // 2, 3)
        bw.write(last - 2, nbits)
    else:
        bw.write(0, 1)
    for ln in lengths[:last]:
        code, cl = clc_codes[ln]
        bw.write_code(code, cl)


def _len_to_prefix(v: int):
    """Length/distance value → (prefix code, extra bits, extra val) —
    the exact inverse of :func:`_lz77_value`: for v ≥ 5, with
    u = v − 1, extra = bitlen(u) − 2 and code = 2·extra + (u >> extra)
    (u >> extra ∈ {2, 3} carries the parity bit)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    extra = u.bit_length() - 2
    code = 2 * extra + (u >> extra)
    return code, extra, u & ((1 << extra) - 1)


def _sub_px(p, q):
    """Per-channel mod-256 subtract of two packed ARGB values."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) - ((q >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _forward_predictor(px, w, h, modes, bits):
    """Forward predictor transform (fixture side): residual[i] =
    pixel[i] − predict(original neighbors) mod 256 — the exact inverse
    of :func:`_apply_predictor` (which reconstructs originals
    progressively, so predictions here come from the ORIGINAL image)."""
    pw = (w + (1 << bits) - 1) >> bits
    out = [0] * (w * h)
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[i - 1]
        elif x == 0:
            pred = px[i - w]
        else:
            mode = (modes[(y >> bits) * pw + (x >> bits)] >> 8) & 0xFF
            l = px[i - 1]  # noqa: E741
            t = px[i - w]
            tl = px[i - w - 1]
            tr = px[i - w + 1]
            pred = {
                0: 0xFF000000, 1: l, 2: t, 3: tr, 4: tl,
                5: _avg2(_avg2(l, tr), t), 6: _avg2(l, tl),
                7: _avg2(l, t), 8: _avg2(tl, t), 9: _avg2(t, tr),
                10: _avg2(_avg2(l, tl), _avg2(t, tr)),
                11: _select(l, t, tl), 12: _cas_full(l, t, tl),
                13: _cas_half(_avg2(l, t), tl),
            }[mode]
        out[i] = _sub_px(px[i], pred)
    return out


def _forward_color(px, w, h, ctes, bits):
    """Forward color transform (fixture side): the exact inverse of
    :func:`_apply_color_transform` (the red_to_blue term uses the
    ORIGINAL red, which is what the decoder reconstructs first)."""
    pw = (w + (1 << bits) - 1) >> bits
    out = [0] * (w * h)
    for i in range(w * h):
        x, y = i % w, i // w
        cte = ctes[(y >> bits) * pw + (x >> bits)]
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        v = px[i]
        a = (v >> 24) & 0xFF
        r = (v >> 16) & 0xFF
        g = (v >> 8) & 0xFF
        b = v & 0xFF
        r_res = (r - _ct_delta(g2r, g)) & 0xFF
        b_res = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        out[i] = (a << 24) | (r_res << 16) | (g << 8) | b_res
    return out


def encode_webp(rgb, subtract_green: bool = False, palette: bool = False,
                cache_bits: int = 0, use_runs: bool = True,
                predictor=None, color_transform=None) -> bytes:
    """FIXTURE-side VP8L encoder: histogram Huffman codes, optional
    subtract-green / color-indexing / predictor / color transforms,
    optional color cache, and distance-1 run LZ77 (plain distance
    codes). ``predictor`` / ``color_transform`` are (size_bits,
    [sub-image values]) pairs — mode in the green channel for the
    predictor, (r2b, g2b, g2r) in the red/green/blue channels for the
    color transform."""
    import numpy as np

    arr = np.asarray(rgb, np.uint8)
    h, w = arr.shape[:2]
    argb = (
        (0xFF << 24)
        | (arr[..., 0].astype(np.uint32) << 16)
        | (arr[..., 1].astype(np.uint32) << 8)
        | arr[..., 2].astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    if predictor is not None:
        bits, modes = predictor
        px = _forward_predictor(argb.tolist(), w, h, modes, bits)
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        bw.write(bits - 2, 3)
        _encode_image(bw, modes, 0, False, top_level=False)
        bw.write(0, 1)  # no more transforms
        _encode_image(bw, px, cache_bits, use_runs)
        return _wrap_riff(bw)
    if color_transform is not None:
        bits, ctes = color_transform
        px = _forward_color(argb.tolist(), w, h, ctes, bits)
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(bits - 2, 3)
        _encode_image(bw, ctes, 0, False, top_level=False)
        bw.write(0, 1)
        _encode_image(bw, px, cache_bits, use_runs)
        return _wrap_riff(bw)

    if palette:
        colors = []
        index_of = {}
        for v in argb.tolist():
            if v not in index_of:
                index_of[v] = len(colors)
                colors.append(v)
        if len(colors) > 256:
            raise ValueError("palette fixture needs ≤256 colors")
        n = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # color-indexing transform
        bw.write(n - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        _encode_image(bw, deltas, 0, False, top_level=False)
        if n <= 2:
            xbits = 3
        elif n <= 4:
            xbits = 2
        elif n <= 16:
            xbits = 1
        else:
            xbits = 0
        packed_w = (w + (1 << xbits) - 1) >> xbits
        idx = np.asarray([index_of[v] for v in argb.tolist()], np.uint32)
        idx = idx.reshape(h, w)
        packed = np.zeros((h, packed_w), np.uint32)
        per = 8 >> xbits if xbits else 8
        for x in range(w):
            shift = (x & ((1 << xbits) - 1)) * per if xbits else 0
            packed[:, x >> xbits] |= idx[:, x] << shift
        argb = ((0xFF << 24) | (packed << 8)).reshape(-1)
        w = packed_w
    elif subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
    bw.write(0, 1)  # no more transforms

    _encode_image(bw, argb.tolist(), cache_bits, use_runs)
    return _wrap_riff(bw)


def _wrap_riff(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bytes(bw.bits)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _encode_image(bw: _BitWriter, px, cache_bits: int, use_runs: bool,
                  top_level: bool = True):
    """Serialize a flat ARGB list as one spatially-coded image (single
    prefix-code group, optional cache, distance-1 runs)."""
    # RFC 9649 §4.3 order: color-cache-info first, then (top level
    # only) the meta-prefix bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache_size = 1 << cache_bits
    else:
        bw.write(0, 1)
        cache_size = 0
    if top_level:
        bw.write(0, 1)  # no meta prefix codes
    cache = [None] * cache_size

    # tokenize: (kind, payload) with kinds lit / run / cache
    tokens = []
    i, n = 0, len(px)
    while i < n:
        if use_runs and i and px[i] == px[i - 1]:
            j = i
            while j < n and px[j] == px[i - 1]:
                j += 1
            tokens.append(("run", j - i))
            for k in range(i, j):
                if cache_size:
                    key = ((0x1E35A7BD * px[k]) & 0xFFFFFFFF) >> (
                        32 - cache_bits
                    )
                    cache[key] = px[k]
            i = j
            continue
        v = px[i]
        if cache_size:
            key = ((0x1E35A7BD * v) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == v:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = v
        tokens.append(("lit", v))
        i += 1

    gfreq = [0] * (256 + 24 + cache_size)
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    for kind, val in tokens:
        if kind == "lit":
            gfreq[(val >> 8) & 0xFF] += 1
            rfreq[(val >> 16) & 0xFF] += 1
            bfreq[val & 0xFF] += 1
            afreq[(val >> 24) & 0xFF] += 1
        elif kind == "cache":
            gfreq[280 + val] += 1
        else:
            code, _, _ = _len_to_prefix(min(val, 4096))
            gfreq[256 + code] += 1
            dcode, _, _ = _len_to_prefix(1 + 120)  # plain distance 1
            dfreq[dcode] += 1
    for f in (rfreq, bfreq, afreq, dfreq):
        if not any(f):
            f[0] = 1  # unused channel still needs a valid code
    if not any(gfreq):
        gfreq[0] = 1

    glen = _huffman_lengths(gfreq)
    rlen = _huffman_lengths(rfreq)
    blen = _huffman_lengths(bfreq)
    alen = _huffman_lengths(afreq)
    dlen = _huffman_lengths(dfreq)
    for lengths in (glen, rlen, blen, alen, dlen):
        _write_prefix_code(bw, lengths)
    gc = _canon_from_lengths(glen)
    rc = _canon_from_lengths(rlen)
    bc = _canon_from_lengths(blen)
    ac = _canon_from_lengths(alen)
    dc = _canon_from_lengths(dlen)

    def emit(codes, sym):
        if len(codes) == 1:
            return  # one-symbol code reads zero bits on the decode side
        code, ln = codes[sym]
        bw.write_code(code, ln)

    for kind, val in tokens:
        if kind == "lit":
            emit(gc, (val >> 8) & 0xFF)
            emit(rc, (val >> 16) & 0xFF)
            emit(bc, val & 0xFF)
            emit(ac, (val >> 24) & 0xFF)
        elif kind == "cache":
            emit(gc, 280 + val)
        else:
            rem = val
            while rem:
                chunk = min(rem, 4096)
                code, extra, ev = _len_to_prefix(chunk)
                emit(gc, 256 + code)
                bw.write(ev, extra)
                dcode, dextra, dev = _len_to_prefix(121)
                emit(dc, dcode)
                bw.write(dev, dextra)
                rem -= chunk
