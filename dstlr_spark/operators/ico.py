"""Windows ICO / CUR icon container — pure struct, delegation decode.

ICO is a directory of images where each entry is either a complete
PNG stream or a headerless DIB with DOUBLED height (XOR color rows +
a 1-bpp AND transparency mask). Both payload forms decode by
DELEGATION to the battle-tested codecs already in the dispatch —
the PNG entry verbatim, the DIB entry by synthesizing the missing
BITMAPFILEHEADER and un-doubling the height, then handing the result
to :func:`dstlr_spark.operators.multimodal.decode_rgb_bytes` (the
same embedded-stream pattern as BI_PNG BMP and JPEG-in-TIFF). The
AND mask is transparency-only and is dropped, matching the shared
alpha rule.

:func:`decode_ico` picks the largest entry (the standard "best
image" rule) and returns its (h, w, 3) RGB array.

Contract: malformed → ValueError; payload codecs keep their own
stub surfaces; never struct.error/IndexError.
"""

from __future__ import annotations

import struct


def _entry_dims(wb: int, hb: int):
    return (wb or 256), (hb or 256)


def decode_ico(b: bytes):
    """REAL ICO/CUR decode → (h, w, 3) uint8 RGB of the largest
    entry."""
    if len(b) < 6:
        raise ValueError("truncated ICO header")
    reserved, kind, count = struct.unpack("<HHH", b[:6])
    if reserved != 0 or kind not in (1, 2) or count == 0:
        raise ValueError("not an ICO/CUR stream")
    best = None
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(b):
            raise ValueError("truncated ICO directory")
        wb, hb, _cc, _rsv, _p, _bc, size, data_off = struct.unpack(
            "<BBBBHHII", b[off : off + 16]
        )
        w, h = _entry_dims(wb, hb)
        if best is None or w * h > best[0]:
            best = (w * h, size, data_off)
    _, size, data_off = best
    blob = b[data_off : data_off + size]
    if len(blob) != size:
        raise ValueError("truncated ICO image data")

    from dstlr_spark.operators.multimodal import PNG_MAGIC, decode_rgb_bytes

    if blob[: len(bytes.fromhex(PNG_MAGIC))] == bytes.fromhex(PNG_MAGIC):
        return decode_rgb_bytes(blob)  # PNG entry, verbatim

    # headerless DIB: BITMAPINFOHEADER with doubled height (XOR rows +
    # AND mask). Rebuild a standalone BMP over the XOR rows only.
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB header")
    (hdr_size, bw, bh2, planes, bpp, comp, _si, _xp, _yp, clr_used,
     _imp) = struct.unpack("<IiiHHIIiiII", blob[:40])
    if hdr_size != 40 or comp != 0:
        raise ValueError(f"ICO DIB header size {hdr_size} comp {comp}")
    if bh2 <= 0 or bh2 % 2:
        raise ValueError(f"ICO DIB height {bh2} is not doubled")
    h = bh2 // 2
    if bw <= 0 or bw * h > 1 << 26:
        raise ValueError(f"ICO dims {bw}x{h} invalid")
    n_pal = clr_used or (1 << bpp if bpp <= 8 else 0)
    pal = blob[40 : 40 + 4 * n_pal]
    if len(pal) != 4 * n_pal:
        raise ValueError("truncated ICO palette")
    xor_row = ((bw * bpp + 31) // 32) * 4
    xor = blob[40 + 4 * n_pal : 40 + 4 * n_pal + xor_row * h]
    if len(xor) != xor_row * h:
        raise ValueError("truncated ICO XOR rows")
    info = struct.pack(
        "<IiiHHIIiiII", 40, bw, h, planes or 1, bpp, 0, xor_row * h,
        0, 0, clr_used, 0,
    )
    pixel_off = 14 + 40 + 4 * n_pal
    bmp = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(xor), 0, 0, pixel_off)
        + info
        + pal
        + xor
    )
    return decode_rgb_bytes(bmp)


def encode_ico(rgb, png: bool = False, extra_small_entry: bool = True) -> bytes:
    """FIXTURE-side ICO encoder: one full-size entry (24-bit DIB with
    a zero AND mask, or a PNG stream when ``png``), optionally
    preceded by a 1×1 decoy entry so tests exercise the largest-entry
    selection rule."""
    import numpy as np

    arr = np.asarray(rgb, np.uint8)
    h, w = arr.shape[:2]
    if w > 256 or h > 256:
        raise ValueError("ICO fixtures are ≤256 px")

    def dib_entry(a):
        eh, ew = a.shape[:2]
        row = ((ew * 3 + 3) // 4) * 4
        rows = np.zeros((eh, row), np.uint8)
        rows[:, : ew * 3] = a[::-1, :, ::-1].reshape(eh, ew * 3)
        and_row = ((ew + 31) // 32) * 4
        mask = b"\x00" * (and_row * eh)
        info = struct.pack(
            "<IiiHHIIiiII", 40, ew, eh * 2, 1, 24, 0,
            row * eh + and_row * eh, 0, 0, 0, 0,
        )
        return info + rows.tobytes() + mask

    entries = []
    if extra_small_entry:
        entries.append((1, 1, dib_entry(arr[:1, :1])))
    if png:
        from dstlr_spark.operators.multimodal import encode_png

        entries.append((w, h, encode_png(arr)))
    else:
        entries.append((w, h, dib_entry(arr)))

    out = struct.pack("<HHH", 0, 1, len(entries))
    data_off = 6 + 16 * len(entries)
    body = b""
    for ew, eh, blob in entries:
        out += struct.pack(
            "<BBBBHHII", ew % 256, eh % 256, 0, 0, 1, 24, len(blob),
            data_off + len(body),
        )
        body += blob
    return out + body
