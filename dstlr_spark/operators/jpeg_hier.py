"""Hierarchical JPEG (T.81 Annex J): DHP-led multi-frame pyramids.

The last JPEG family in the decode gate: a hierarchical stream opens
with DHP (0xDE, a SOF-shaped header carrying the FULL-resolution
dimensions), then a pyramid of frames — the first non-differential
(here SOF3, lossless Huffman: the only mode whose reconstruction is
exact by construction and can therefore join the planted-pixel
equality oracle), each later frame differential (SOF7), optionally
preceded by EXP (0xDF) which doubles the reference horizontally
and/or vertically through the NORMATIVE J.1.1.2 bilinear filter
(out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1] + 1) >> 1, edge
replicated). A differential scan codes per-sample differences with
the Annex-H SSSS machinery, but the prediction is ALWAYS the
(expanded) reference sample — the scan header's predictor field must
be 0 — and reconstruction is (ref + diff) mod 2^16 (J.2.2).

Scope: lossless hierarchies under BOTH entropy layers — Huffman
(SOF3 first frame + SOF7 differentials) and arithmetic (SOF11 first
frame + SOF15 differentials, the QM coder and H.1.2 gradient-
conditioned statistical model of :mod:`jpeg_arith`, DAC honored) —
grayscale, RGB, or CMYK (Adobe inverted storage, converted at EOI by
the shared closed-form), 1x1 sampling, 2-16 bit precision, restart
intervals, any number of pyramid levels. DCT-mode hierarchical
frames (SOF5/6, SOF13/14) raise NotImplementedError — the lossless
hierarchies are the ones whose decode is exact, hence the ones
the value-equality gate can hold. Malformed input always raises
ValueError (the pinned decoder exception contract).

Reference parity anchor: the reference pipeline treats media as
opaque bytes (SURVEY.md §2.12 mandate surface); this codec exists so
the multimodal decode operators are REAL, not stubs, with no imaging
library in the sandbox.
"""

from __future__ import annotations

import struct

from dstlr_spark.operators.jpeg import (
    _LL_SYMBOLS,
    _BitReader,
    _BitWriter,
    _build_huffman,
    _category,
    _entropy_segments,
    _extend,
    _fixed_table,
    _huff_decode,
)

__all__ = ["decode_jpeg_hier", "encode_jpeg_hier"]

_DCT_SOFS = (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC9, 0xCA, 0xCD, 0xCE)


def _parse_sofish(seg: bytes, what: str):
    """Parse a SOF/DHP payload → (precision, h, w, comps) where comps
    is [(comp_id, H, V, Tq), ...]. Shared by DHP and the frame
    headers — Annex J gives DHP the exact SOF syntax."""
    if len(seg) < 6:
        raise ValueError(f"JPEG {what} truncated")
    prec = seg[0]
    if not 2 <= prec <= 16:
        raise ValueError(f"JPEG {what} precision {prec} out of range (2-16)")
    h, w = struct.unpack(">HH", seg[1:5])
    if not h or not w:
        raise ValueError(f"JPEG {what} dimensions {w}x{h} invalid")
    ncomp = seg[5]
    if ncomp not in (1, 3, 4):
        raise NotImplementedError(f"STUB: JPEG {ncomp}-component color")
    if len(seg) < 6 + 3 * ncomp:
        raise ValueError(f"JPEG {what} component list truncated")
    comps = []
    for c in range(ncomp):
        cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
        if (hv >> 4) != 1 or (hv & 15) != 1:
            raise NotImplementedError(
                "STUB: hierarchical lossless with sampling factors != 1x1"
            )
        comps.append((cid, 1, 1, tq))
    return prec, h, w, comps


def _expand_planes(planes, out_h: int, out_w: int, eh: int, ev: int):
    """J.1.1.2 reference expansion: double each flagged axis with the
    normative bilinear filter, then require the result to match the
    next frame's dimensions exactly (2n or 2n-1 per axis — the odd
    case trims the final interpolated sample; the even case's last
    sample degenerates to edge replication since (2a+1)>>1 == a)."""
    for p in planes:
        in_h, in_w = len(p), len(p[0])
        if ev and out_h not in (2 * in_h - 1, 2 * in_h):
            raise ValueError("JPEG EXP output does not match next frame dims")
        if eh and out_w not in (2 * in_w - 1, 2 * in_w):
            raise ValueError("JPEG EXP output does not match next frame dims")
        if (not ev and out_h != in_h) or (not eh and out_w != in_w):
            raise ValueError("JPEG frame dims changed without EXP on that axis")
    out = []
    for p in planes:
        if eh:
            w = len(p[0])
            tw = out_w
            q = []
            for row in p:
                new = [0] * tw
                for i in range(w):
                    j = 2 * i
                    if j < tw:
                        new[j] = row[i]
                    if j + 1 < tw:
                        nxt = row[i + 1] if i + 1 < w else row[i]
                        new[j + 1] = (row[i] + nxt + 1) >> 1
                q.append(new)
            p = q
        if ev:
            h = len(p)
            th = out_h
            q = [None] * th
            for i in range(h):
                j = 2 * i
                if j < th:
                    q[j] = list(p[i])
                if j + 1 < th:
                    nxt = p[i + 1] if i + 1 < h else p[i]
                    q[j + 1] = [(a + b + 1) >> 1 for a, b in zip(p[i], nxt)]
            p = q
        out.append(p)
    return out


def _decode_hier_scan(
    b, pos, h, w, tables, prec, predictor, restart_interval, ref
):
    """One hierarchical scan: the Annex-H sample walk (interleaved one
    sample per component per MCU, SSSS difference categories, restart
    resets) with the prediction source switched by frame kind — the
    H.1.2.1 spatial predictors for the non-differential first frame
    (``ref is None``), the co-located reference sample for
    differential frames (J.2.2: reconstruction (ref + diff) mod 2^16).
    Returns (planes, end_pos) so the marker walk can continue past the
    entropy data — the multi-frame need the single-frame decoder in
    :mod:`dstlr_spark.operators.jpeg` never had."""
    segs, end = _entropy_segments(b, pos)
    if len(segs) > 1 and not restart_interval:
        raise ValueError("JPEG RST marker without a DRI segment")
    nc = len(tables)
    default = 1 << (prec - 1)
    planes = [[[0] * w for _ in range(h)] for _ in range(nc)]
    seg_i = 0
    br = _BitReader(segs[0][0])
    reset = True
    for m in range(h * w):
        if restart_interval and m and m % restart_interval == 0:
            closing = segs[seg_i][1]
            if closing is None or closing != (m // restart_interval - 1) % 8:
                raise ValueError("JPEG restart marker missing/out of sequence")
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG truncated at restart boundary")
            br = _BitReader(segs[seg_i][0])
            reset = True
        r, c = divmod(m, w)
        for ci in range(nc):
            t = _huff_decode(br, tables[ci])
            if t > 16:
                raise ValueError("JPEG lossless SSSS > 16")
            d = 32768 if t == 16 else _extend(br.receive(t), t)
            p = planes[ci]
            if ref is not None:
                px = ref[ci][r][c]
            elif reset:
                px = default
            elif r == 0:
                px = p[0][c - 1]
            elif c == 0:
                px = p[r - 1][0]
            else:
                row, above = p[r], p[r - 1]
                ra, rb, rc_ = row[c - 1], above[c], above[c - 1]
                if predictor == 1:
                    px = ra
                elif predictor == 2:
                    px = rb
                elif predictor == 3:
                    px = rc_
                elif predictor == 4:
                    px = ra + rb - rc_
                elif predictor == 5:
                    px = ra + ((rb - rc_) >> 1)
                elif predictor == 6:
                    px = rb + ((ra - rc_) >> 1)
                else:
                    px = (ra + rb) >> 1
            p[r][c] = (px + d) & 0xFFFF
        reset = False
    mask = (1 << prec) - 1
    if mask != 0xFFFF:
        for p in planes:
            for r in range(h):
                row = p[r]
                p[r] = [v & mask for v in row]
    return planes, end


def _decode_hier_scan_arith(
    b, pos, h, w, tds, prec, predictor, restart_interval, ref, dac_dc
):
    """The arithmetic twin of :func:`_decode_hier_scan`: the same
    interleaved sample walk with the entropy layer swapped for the QM
    coder under the H.1.2 gradient-conditioned lossless model of
    :mod:`jpeg_arith` (statistics shared per DC-conditioning table id,
    Da/Db categories from the previously coded diffs, restart resets
    coder + statistics + gradient history). Prediction switches on
    frame kind exactly as in the Huffman walk: spatial H.1.2.1
    predictors for the first frame, the co-located reference sample
    for differential frames, reconstruction (ref + diff) mod 2^16."""
    from dstlr_spark.operators.jpeg import _entropy_segments
    from dstlr_spark.operators.jpeg_arith import (
        DEFAULT_DC_L,
        DEFAULT_DC_U,
        _ArithDecoder,
        _decode_ll_diff,
        _LL_STAT_BINS,
    )

    segs, end = _entropy_segments(b, pos)
    if len(segs) > 1 and not restart_interval:
        raise ValueError("JPEG RST marker without a DRI segment")
    nc = len(tds)
    conds = []
    for td in tds:
        ll, uu = dac_dc.get(td, (DEFAULT_DC_L, DEFAULT_DC_U))
        conds.append((td, (1 << ll) >> 1, (1 << uu) >> 1))
    default = 1 << (prec - 1)
    planes = [[[0] * w for _ in range(h)] for _ in range(nc)]

    def fresh(seg_i):
        return (
            _ArithDecoder(segs[seg_i][0]),
            {td: bytearray(_LL_STAT_BINS) for td, _, _ in conds},
            [[0] * w for _ in range(nc)],  # Db categories per column
            [0] * nc,  # Da category (left neighbor, current row)
        )

    seg_i = 0
    dec, stats, cat_above, cat_left = fresh(0)
    reset = True
    last_reset_m = 0
    for m in range(h * w):
        if restart_interval and m and m % restart_interval == 0:
            closing = segs[seg_i][1]
            if closing is None or closing != (m // restart_interval - 1) % 8:
                raise ValueError("JPEG restart marker missing/out of sequence")
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG truncated at restart boundary")
            dec, stats, cat_above, cat_left = fresh(seg_i)
            reset = True
            last_reset_m = m
        r, c = divmod(m, w)
        if c == 0:
            cat_left = [0] * nc
        for ci in range(nc):
            td, lo, hi = conds[ci]
            # Db only if the sample above was coded after the last
            # restart (gradients do not cross restart boundaries)
            cb = cat_above[ci][c] if m - last_reset_m >= w else 0
            d, cat = _decode_ll_diff(dec, stats[td], cat_left[ci], cb, lo, hi)
            p = planes[ci]
            if ref is not None:
                px = ref[ci][r][c]
            elif reset:
                px = default
            elif r == 0:
                px = p[0][c - 1]
            elif c == 0:
                px = p[r - 1][0]
            else:
                row, above = p[r], p[r - 1]
                ra, rb, rc_ = row[c - 1], above[c], above[c - 1]
                if predictor == 1:
                    px = ra
                elif predictor == 2:
                    px = rb
                elif predictor == 3:
                    px = rc_
                elif predictor == 4:
                    px = ra + rb - rc_
                elif predictor == 5:
                    px = ra + ((rb - rc_) >> 1)
                elif predictor == 6:
                    px = rb + ((ra - rc_) >> 1)
                else:
                    px = (ra + rb) >> 1
            p[r][c] = (px + d) & 0xFFFF
            cat_above[ci][c] = cat
            cat_left[ci] = cat
        reset = False
    mask = (1 << prec) - 1
    if mask != 0xFFFF:
        for p in planes:
            for r in range(h):
                row = p[r]
                p[r] = [v & mask for v in row]
    return planes, end


def decode_jpeg_hier(b: bytes):
    """Decode a hierarchical (DHP-led) JPEG → (h, w, 3) uint8/uint16
    RGB at the full DHP resolution. Grayscale replicates to RGB (the
    shared ``decode_rgb_bytes`` contract). Entered from
    :func:`dstlr_spark.operators.jpeg.decode_jpeg` when the marker
    walk meets DHP."""
    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    htables: dict[tuple[int, int], object] = {}
    dac_dc: dict[int, tuple[int, int]] = {}
    dhp = None  # (prec, full_h, full_w, comps)
    frame = None  # (h, w, comps, differential, arith)
    ref = None  # reconstructed planes of the latest frame
    pending_exp = None  # (eh, ev) from an EXP marker awaiting a frame
    restart_interval = 0
    pos = 2
    n = len(b)
    while True:
        if pos + 2 > n:
            raise ValueError("JPEG truncated before EOI")
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG expected marker at {pos}, got {b[pos]:#x}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: the pyramid must have reached DHP dims
            if dhp is None or ref is None:
                raise ValueError("JPEG hierarchical EOI before any frame")
            prec, fh, fw, _ = dhp
            if len(ref[0]) != fh or len(ref[0][0]) != fw:
                raise ValueError(
                    "JPEG hierarchical final frame does not reach DHP dims"
                )
            mask = (1 << prec) - 1
            dtype = np.uint8 if prec <= 8 else np.uint16
            out = (np.array(ref, np.int64) & mask).astype(dtype)
            if len(ref) == 1:
                return np.repeat(out[0][..., None], 3, axis=2)
            if len(ref) == 4:
                from dstlr_spark.operators.jpeg import _cmyk_to_rgb

                return _cmyk_to_rgb(list(out), mask)
            return np.stack([out[0], out[1], out[2]], axis=2)
        if pos + 2 > n:
            raise ValueError("JPEG truncated segment length")
        seglen = struct.unpack(">H", b[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError("JPEG segment overruns stream")
        seg = b[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDE:  # DHP: full-resolution header, no entropy
            if dhp is not None:
                raise ValueError("JPEG duplicate DHP")
            dhp = _parse_sofish(seg, "DHP")
        elif marker == 0xDF:  # EXP: reference expansion request
            if len(seg) < 1:
                raise ValueError("JPEG EXP truncated")
            eh, ev = seg[0] >> 4, seg[0] & 15
            if eh > 1 or ev > 1 or not (eh or ev):
                raise ValueError("JPEG EXP expansion flags invalid")
            if ref is None:
                raise ValueError("JPEG EXP before any reference frame")
            pending_exp = (eh, ev)
        elif marker == 0xC4:  # DHT — tables persist across frames
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
        elif marker == 0xCC:  # DAC: arithmetic conditioning (persists)
            s = 0
            while s + 2 <= len(seg):
                tc, tb = seg[s] >> 4, seg[s] & 15
                cs = seg[s + 1]
                s += 2
                if tc == 0:
                    ll, uu = cs & 15, cs >> 4
                    if ll > uu or uu > 15:
                        raise ValueError("JPEG DAC DC conditioning invalid")
                    dac_dc[tb] = (ll, uu)
                elif tc != 1:  # AC conditioning is legal but unused here
                    raise ValueError("JPEG DAC class invalid")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG DRI truncated")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC3, 0xC7, 0xCB, 0xCF):  # lossless frame
            # non-differential (SOF3 Huffman / SOF11 arithmetic) or
            # differential (SOF7 Huffman / SOF15 arithmetic)
            if dhp is None:
                raise ValueError(
                    "JPEG hierarchical frame before DHP (a bare SOF3 stream "
                    "belongs to decode_jpeg, which dispatches here on DHP)"
                )
            names = {0xC3: "SOF3", 0xC7: "SOF7", 0xCB: "SOF11", 0xCF: "SOF15"}
            prec, h, w, comps = _parse_sofish(seg, names[marker])
            if prec != dhp[0]:
                raise ValueError("JPEG frame precision differs from DHP")
            if len(comps) != len(dhp[3]):
                raise ValueError("JPEG frame component count differs from DHP")
            if h > dhp[1] or w > dhp[2]:
                raise ValueError("JPEG frame exceeds DHP dimensions")
            differential = marker in (0xC7, 0xCF)
            if differential and ref is None:
                raise ValueError("JPEG differential frame before a reference")
            if not differential and ref is not None:
                raise ValueError("JPEG second non-differential frame")
            frame = (h, w, comps, differential, marker in (0xCB, 0xCF))
        elif marker in _DCT_SOFS:
            raise NotImplementedError(
                f"STUB: JPEG SOF {marker:#x} in a hierarchy — only the "
                "lossless pyramids (SOF3/SOF11 + SOF7/SOF15) decode exactly"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before a hierarchical frame")
            h, w, comps, differential, arith = frame
            ns = seg[0] if seg else 0
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS header truncated")
            if ns != len(comps):
                raise NotImplementedError(
                    "STUB: hierarchical lossless multi-scan (non-interleaved)"
                )
            tables = []
            tds = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                if cs != comps[c][0]:
                    raise ValueError(
                        "JPEG scan component order differs from frame"
                    )
                tds.append(tdta >> 4)
                if not arith:
                    if (0, tdta >> 4) not in htables:
                        raise ValueError("JPEG missing Huffman table for scan")
                    tables.append(htables[(0, tdta >> 4)])
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if se != 0 or (ahal >> 4) != 0:
                raise ValueError("JPEG lossless scan header invalid")
            if ahal & 15:
                raise NotImplementedError(
                    "STUB: point transform inside a hierarchy"
                )
            prec = dhp[0]
            if differential:
                if ss != 0:
                    raise ValueError(
                        "JPEG differential lossless predictor must be 0"
                    )
                if pending_exp is not None:
                    ref = _expand_planes(ref, h, w, *pending_exp)
                    pending_exp = None
                if len(ref[0]) != h or len(ref[0][0]) != w:
                    raise ValueError(
                        "JPEG differential frame dims differ from reference"
                    )
                scan_ref = ref
            else:
                if not 1 <= ss <= 7:
                    raise ValueError(f"JPEG lossless predictor {ss} invalid")
                scan_ref = None
            if arith:
                ref, pos = _decode_hier_scan_arith(
                    b, pos, h, w, tds, prec, ss, restart_interval,
                    scan_ref, dac_dc,
                )
            else:
                ref, pos = _decode_hier_scan(
                    b, pos, h, w, tables, prec, ss, restart_interval, scan_ref
                )
            frame = None
        # APPn / COM / DQT / anything else: skip


_EXP_BOTH = b"\xff\xdf\x00\x03\x11"  # EXP segment: Eh=1, Ev=1


def encode_jpeg_hier(
    img, levels: int = 2, predictor: int = 4, restart_interval: int = 0,
    arith: bool = False, dc_cond=None
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB array as a REAL
    hierarchical JPEG (T.81 Annex J): DHP, then a ``levels``-deep
    lossless pyramid — the smallest level as a non-differential SOF3
    frame, each following level as EXP (expand 2x2) + a SOF7
    differential frame whose diffs are taken against the NORMATIVE
    J.1.1.2 expansion of the previous level (so decode(encode(img))
    == img bit-for-bit at every level count). The pyramid downsamples
    by decimation (``a[::2, ::2]``) — Annex J leaves the downsampling
    filter to the encoder precisely because the differential frames
    correct it exactly. uint8 encodes at 8-bit precision, uint16 at
    16-bit; ``restart_interval`` > 0 emits DRI + RSTn every
    that-many samples in every frame. ``arith=True`` swaps the entropy
    layer for the QM coder (SOF11 first frame + SOF15 differentials,
    the H.1.2 lossless statistical model of :mod:`jpeg_arith`) —
    same pyramid, same diffs, still exact; ``dc_cond=(L, U)`` emits a
    DAC segment and conditions the model on it."""
    import numpy as np

    arr = np.asarray(img)
    prec = 16 if arr.dtype == np.uint16 else 8
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor {predictor} out of range")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if levels > 1 and (1 << (levels - 1)) > max(h, w):
        raise ValueError(f"{levels} levels exceed image dimensions {w}x{h}")
    pyramid = [arr]
    for _ in range(levels - 1):
        pyramid.append(pyramid[-1][::2, ::2])
    comp_ids = [1] if gray else list(range(1, arr.shape[2] + 1))
    nc = len(comp_ids)

    def plane_lists(a):
        a = a.astype(np.int64)
        return [a.tolist()] if gray else [a[..., i].tolist() for i in range(nc)]

    def sofish(marker, a):
        body = struct.pack(">BHHB", prec, a.shape[0], a.shape[1], nc)
        for cid in comp_ids:
            body += bytes([cid, 0x11, 0])
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    def sos(ss):
        body = bytes([nc])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC-class table 0
        body += bytes([ss, 0, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def code_scan(planes, ref, fh, fw):
        # the Annex-H sample walk again, from the encoder side: spatial
        # prediction when ref is None, reference prediction otherwise
        default = 1 << (prec - 1)
        chunks = bytearray()
        bw = _BitWriter()
        reset = True
        for m in range(fh * fw):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                chunks += bw.out
                bw = _BitWriter()
                chunks += bytes(
                    [0xFF, 0xD0 + (m // restart_interval - 1) % 8]
                )
                reset = True
            r, c = divmod(m, fw)
            for ci, p in enumerate(planes):
                if ref is not None:
                    px = ref[ci][r][c]
                elif reset:
                    px = default
                elif r == 0:
                    px = p[0][c - 1]
                elif c == 0:
                    px = p[r - 1][0]
                else:
                    row, above = p[r], p[r - 1]
                    ra, rb, rc_ = row[c - 1], above[c], above[c - 1]
                    if predictor == 1:
                        px = ra
                    elif predictor == 2:
                        px = rb
                    elif predictor == 3:
                        px = rc_
                    elif predictor == 4:
                        px = ra + rb - rc_
                    elif predictor == 5:
                        px = ra + ((rb - rc_) >> 1)
                    elif predictor == 6:
                        px = rb + ((ra - rc_) >> 1)
                    else:
                        px = (ra + rb) >> 1
                d = ((p[r][c] - px + 32768) & 0xFFFF) - 32768
                if d == -32768:  # ≡ +32768 mod 2^16: SSSS=16, no bits
                    bw.write(ll_enc[16][1], ll_enc[16][0])
                else:
                    t = _category(d)
                    bw.write(ll_enc[t][1], ll_enc[t][0])
                    if t:
                        bw.write(d if d > 0 else d + (1 << t) - 1, t)
            reset = False
        bw.flush()
        chunks += bw.out
        return bytes(chunks)

    def code_scan_arith(planes, ref, fh, fw):
        # the same sample walk under the QM coder: shared statistics
        # (every scan component selects DC-conditioning table 0),
        # gradient categories tracked exactly as the decoder twin does
        from dstlr_spark.operators.jpeg_arith import (
            _LL_STAT_BINS,
            _ArithEncoder,
            _encode_ll_diff,
            _ll_predict,
        )

        default = 1 << (prec - 1)
        chunks = bytearray()

        def fresh():
            return (
                _ArithEncoder(),
                bytearray(_LL_STAT_BINS),
                [[0] * fw for _ in range(nc)],
                [0] * nc,
            )

        enc, stats, cat_above, cat_left = fresh()
        reset = True
        last_reset_m = 0
        for m in range(fh * fw):
            if restart_interval and m and m % restart_interval == 0:
                chunks += enc.finish()
                chunks += bytes(
                    [0xFF, 0xD0 + (m // restart_interval - 1) % 8]
                )
                enc, stats, cat_above, cat_left = fresh()
                reset = True
                last_reset_m = m
            r, c = divmod(m, fw)
            if c == 0:
                cat_left = [0] * nc
            for ci, p in enumerate(planes):
                if ref is not None:
                    px = ref[ci][r][c]
                else:
                    px = _ll_predict(p, r, c, predictor, default, reset)
                d = ((p[r][c] - px + 32768) & 0xFFFF) - 32768
                if d == -32768:  # ≡ +32768 mod 2^16
                    d = 32768
                cb = cat_above[ci][c] if m - last_reset_m >= fw else 0
                cat = _encode_ll_diff(enc, stats, cat_left[ci], cb, d, lo, hi)
                cat_above[ci][c] = cat
                cat_left[ci] = cat
            reset = False
        chunks += enc.finish()
        return bytes(chunks)

    if dc_cond is not None and not arith:
        raise ValueError("dc_cond is an arithmetic-coding parameter")
    ll, uu = dc_cond if dc_cond is not None else (0, 1)
    if not 0 <= ll <= uu <= 15:
        raise ValueError(f"DC conditioning ({ll}, {uu}) invalid")
    lo, hi = (1 << ll) >> 1, (1 << uu) >> 1
    first_sof, diff_sof = (0xCB, 0xCF) if arith else (0xC3, 0xC7)
    scan = code_scan_arith if arith else code_scan
    ll_counts, ll_syms, ll_enc = _fixed_table(_LL_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += sofish(0xDE, arr)  # DHP at full resolution
    if arith:
        if dc_cond is not None:
            body = bytes([0x00, (uu << 4) | ll])
            out += b"\xff\xcc" + struct.pack(">H", 2 + len(body)) + body
    else:
        body = bytes([0x00]) + ll_counts + ll_syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # frame 1: non-differential (SOF3 / SOF11) at the smallest level
    top = pyramid[-1]
    out += sofish(first_sof, top) + sos(predictor)
    out += scan(plane_lists(top), None, top.shape[0], top.shape[1])
    ref_planes = plane_lists(top)
    # remaining levels: EXP + differential (SOF7 / SOF15) against the
    # expansion
    for level in range(levels - 2, -1, -1):
        target = pyramid[level]
        th, tw = target.shape[:2]
        out += _EXP_BOTH
        ref_planes = _expand_planes(ref_planes, th, tw, 1, 1)
        out += sofish(diff_sof, target) + sos(0)
        out += scan(plane_lists(target), ref_planes, th, tw)
        ref_planes = plane_lists(target)
    out += b"\xff\xd9"
    return bytes(out)
