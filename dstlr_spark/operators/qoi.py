"""QOI ("Quite OK Image") decode/encode — pure Python/NumPy.

QOI is the one modern lossless image format whose whole spec fits on
a page: byte-oriented ops over a running 64-slot hash index
(``(3r+5g+7b+11a) % 64``), previous-pixel diffs, and runs — every op
integer-exact, so it joins the format-BLIND planted-pixel oracle
corpus (:func:`dstlr_spark.operators.multimodal.decode_rgb_bytes`
dispatches on the ``qoif`` magic).

Decoder surface (:func:`decode_qoi`): all six ops (QOI_OP_RGB,
QOI_OP_RGBA, INDEX, DIFF, LUMA, RUN), 3- and 4-channel headers
(alpha decoded then dropped, matching the BMP/TGA 32-bpp rule), the
8-byte end marker enforced. The op walk is a per-pixel Python loop —
payloads in the gate corpus are ≤8×8, and at scale the corpus axis is
row parallelism, the same story as every sequential-entropy codec
here (FLAC/LZW/JPEG).

Encoder (:func:`encode_qoi`) is the deterministic FIXTURE side: real
greedy op selection (run → index → diff → luma → rgb), so planted
images exercise every op family at gate time.

Contract: malformed input raises ValueError; never struct.error /
IndexError.
"""

from __future__ import annotations

import struct

_QOI_END = b"\x00" * 7 + b"\x01"


def decode_qoi(b: bytes):
    """REAL QOI decode → (h, w, 3) uint8 RGB array."""
    import numpy as np

    if len(b) < 14 + 8 or b[:4] != b"qoif":
        raise ValueError("not a QOI stream")
    w, h = struct.unpack(">II", b[4:12])
    channels, colorspace = b[12], b[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"QOI channels={channels} colorspace={colorspace}")
    if w == 0 or h == 0 or w * h > 1 << 26:
        raise ValueError(f"QOI dims {w}x{h} invalid")
    if b[-8:] != _QOI_END:
        raise ValueError("QOI end marker missing")
    data = b[14:-8]
    n_px = w * h
    out = bytearray(n_px * 4)
    index = bytearray(64 * 4)
    r, g, bl, a = 0, 0, 0, 255
    pos, ln = 0, len(data)
    px = 0
    while px < n_px:
        if pos >= ln:
            raise ValueError("truncated QOI op stream")
        op = data[pos]
        pos += 1
        if op == 0xFE:  # QOI_OP_RGB
            if pos + 3 > ln:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, bl = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > ln:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, bl, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                i = op << 2
                r, g, bl, a = index[i], index[i + 1], index[i + 2], index[i + 3]
            elif tag == 1:  # DIFF (2-bit deltas, bias 2)
                r = (r + ((op >> 4) & 3) - 2) & 0xFF
                g = (g + ((op >> 2) & 3) - 2) & 0xFF
                bl = (bl + (op & 3) - 2) & 0xFF
            elif tag == 2:  # LUMA (6-bit dg, 4-bit dr-dg / db-dg)
                if pos >= ln:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (op & 0x3F) - 32
                v = data[pos]
                pos += 1
                r = (r + dg - 8 + (v >> 4)) & 0xFF
                g = (g + dg) & 0xFF
                bl = (bl + dg - 8 + (v & 0x0F)) & 0xFF
            else:  # RUN (bias -1; 63/64 reserved for RGB/RGBA above)
                run = (op & 0x3F) + 1
                if px + run > n_px:
                    raise ValueError("QOI run overflows image")
                base = px * 4
                out[base : base + 4] = bytes((r, g, bl, a))
                for k in range(1, run):
                    out[base + 4 * k : base + 4 * k + 4] = out[base : base + 4]
                px += run
                continue
        i = ((r * 3 + g * 5 + bl * 7 + a * 11) % 64) << 2
        index[i : i + 4] = bytes((r, g, bl, a))
        base = px * 4
        out[base : base + 4] = bytes((r, g, bl, a))
        px += 1
    rgba = __import__("numpy").frombuffer(bytes(out), "uint8").reshape(h, w, 4)
    return __import__("numpy").ascontiguousarray(rgba[..., :3])


def encode_qoi(rgb, channels: int = 3) -> bytes:
    """FIXTURE-side QOI encoder with real greedy op selection
    (run → index → diff → luma → rgb)."""
    import numpy as np

    arr = np.asarray(rgb, np.uint8)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    out = bytearray(b"qoif" + struct.pack(">II", w, h) + bytes((channels, 0)))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for p in flat:
        cur = (int(p[0]), int(p[1]), int(p[2]), 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[ih] == cur:
            out.append(ih)
        else:
            dr = (cur[0] - prev[0]) & 0xFF
            dg = (cur[1] - prev[1]) & 0xFF
            db = (cur[2] - prev[2]) & 0xFF
            sdr = dr - 256 if dr > 127 else dr
            sdg = dg - 256 if dg > 127 else dg
            sdb = db - 256 if db > 127 else db
            if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2))
            elif (
                -32 <= sdg <= 31
                and -8 <= sdr - sdg <= 7
                and -8 <= sdb - sdg <= 7
            ):
                out.append(0x80 | (sdg + 32))
                out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
            else:
                out.append(0xFE)
                out += bytes(cur[:3])
        index[ih] = cur
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)
