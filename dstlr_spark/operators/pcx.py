"""ZSoft PCX decode/encode — pure struct/NumPy, zero deps.

PCX packs per-scanline planes under a byte-oriented RLE (control
bytes ≥ 0xC0 carry a 6-bit run count) — integer-exact everywhere, so
it joins the format-BLIND planted-pixel oracle corpus alongside
BMP/PNG/GIF/TIFF/TGA (:func:`dstlr_spark.operators.multimodal.
decode_rgb_bytes` dispatch keys on the 0x0A manufacturer byte +
version/encoding fields).

Decoder surface (:func:`decode_pcx`): version 5 streams at
- 8 bpp × 1 plane with the trailing VGA palette (0x0C marker + 768
  bytes),
- 8 bpp × 3 planes (R/G/B plane runs per scanline),
- 1 bpp × 1 plane monochrome (0 → black, 1 → white),
with ``bytes_per_line`` padding honored per plane row. EGA 16-color
multi-plane layouts raise NotImplementedError (the 4-plane bit-weave
is real but absent from deployed corpora; a loud stub beats an
untested path).

The RLE is decoded per scanline-row (runs do not cross the
``n_planes · bytes_per_line`` row boundary — the spec's rule, and the
fixture encoder enforces it).

Contract: malformed input raises ValueError; unimplemented layouts
NotImplementedError; never struct.error/IndexError.
"""

from __future__ import annotations

import struct


def _rle_rows(data: bytes, n_rows: int, row_bytes: int):
    """PCX RLE → (n_rows, row_bytes) uint8. Control byte with the top
    two bits set → run of (b & 0x3F) copies of the NEXT byte; else a
    literal byte. Each row's decode starts at a fresh packet."""
    import numpy as np

    src = np.frombuffer(data, np.uint8)
    out = np.empty((n_rows, row_bytes), np.uint8)
    pos = 0
    for r in range(n_rows):
        filled = 0
        while filled < row_bytes:
            if pos >= src.size:
                raise ValueError("truncated PCX RLE stream")
            v = int(src[pos])
            pos += 1
            if v >= 0xC0:
                count = v & 0x3F
                if pos >= src.size:
                    raise ValueError("truncated PCX RLE run byte")
                n = min(count, row_bytes - filled)
                if n < count:
                    raise ValueError("PCX RLE run crosses a scanline row")
                out[r, filled : filled + n] = src[pos]
                pos += 1
                filled += n
            else:
                out[r, filled] = v
                filled += 1
    return out


def decode_pcx(b: bytes):
    """REAL PCX decode → (h, w, 3) uint8 RGB array."""
    import numpy as np

    if len(b) < 128:
        raise ValueError("truncated PCX header")
    (
        mfg,
        version,
        encoding,
        bits,
        xmin,
        ymin,
        xmax,
        ymax,
    ) = struct.unpack("<BBBBHHHH", b[:12])
    if mfg != 0x0A:
        raise ValueError("not a PCX stream (manufacturer byte)")
    if encoding != 1:
        raise NotImplementedError(f"STUB: PCX encoding {encoding} (only RLE=1)")
    n_planes = b[65]
    bpl = struct.unpack("<H", b[66:68])[0]
    w, h = xmax - xmin + 1, ymax - ymin + 1
    if w <= 0 or h <= 0 or bpl == 0 or h * n_planes * bpl > 1 << 26:
        # upper bound: reject mutated headers before the row-buffer
        # alloc can raise MemoryError (outside the isolation contract)
        raise ValueError(f"PCX dims {w}x{h} bpl={bpl} invalid")
    rows = _rle_rows(b[128:], h, n_planes * bpl)

    if bits == 8 and n_planes == 3:
        planes = rows.reshape(h, 3, bpl)[:, :, :w]
        return np.ascontiguousarray(planes.transpose(0, 2, 1))
    if bits == 8 and n_planes == 1:
        # trailing VGA palette: 0x0C marker + 768 bytes at stream end
        if len(b) < 128 + 769 or b[-769] != 0x0C:
            raise ValueError("PCX 8-bpp stream missing VGA palette")
        pal = np.frombuffer(b[-768:], np.uint8).reshape(256, 3)
        return pal[rows[:, :w]]
    if bits == 1 and n_planes == 1:
        unpacked = np.unpackbits(rows, axis=1)[:, :w]
        return np.repeat(unpacked[..., None] * np.uint8(255), 3, axis=-1)
    raise NotImplementedError(
        f"STUB: PCX {bits} bpp × {n_planes} planes (EGA multi-plane); "
        "8-bpp VGA-palette, 24-bit 3-plane, and 1-bpp mono decode "
        "natively"
    )


def _rle_row(row) -> bytes:
    """Encode one plane-row with maximal runs (fixture side)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 63 and row[j] == row[i]:
            j += 1
        count, v = j - i, int(row[i])
        if count > 1 or v >= 0xC0:
            out.append(0xC0 | count)
            out.append(v)
        else:
            out.append(v)
        i = j
    return bytes(out)


def encode_pcx(rgb=None, palette=None, indices=None, bilevel=None) -> bytes:
    """FIXTURE-side PCX encoder (version 5, RLE): 24-bit 3-plane from
    ``rgb``; 8-bpp + VGA palette from ``palette``/``indices``; 1-bpp
    mono from a 0/1 ``bilevel`` array."""
    import numpy as np

    if rgb is not None:
        arr = np.asarray(rgb, np.uint8)
        h, w = arr.shape[:2]
        bits, planes, bpl = 8, 3, w + (w & 1)  # even bpl, spec-recommended
        rows = np.zeros((h, planes, bpl), np.uint8)
        rows[:, :, :w] = arr.transpose(0, 2, 1)
        tail = b""
    elif bilevel is not None:
        bl = np.asarray(bilevel, np.uint8)
        h, w = bl.shape
        bits, planes = 1, 1
        packed = np.packbits(bl, axis=1)
        bpl = packed.shape[1] + (packed.shape[1] & 1)
        rows = np.zeros((h, 1, bpl), np.uint8)
        rows[:, 0, : packed.shape[1]] = packed
        tail = b""
    else:
        idx = np.asarray(indices, np.uint8)
        h, w = idx.shape
        bits, planes, bpl = 8, 1, w + (w & 1)
        rows = np.zeros((h, 1, bpl), np.uint8)
        rows[:, 0, :w] = idx
        pal = np.zeros((256, 3), np.uint8)
        p = np.asarray(palette, np.uint8)
        pal[: p.shape[0]] = p
        tail = b"\x0c" + pal.tobytes()
    hdr = bytearray(128)
    struct.pack_into(
        "<BBBBHHHHHH", hdr, 0, 0x0A, 5, 1, bits, 0, 0, w - 1, h - 1, 72, 72
    )
    hdr[65] = planes
    struct.pack_into("<H", hdr, 66, bpl)
    struct.pack_into("<H", hdr, 68, 1)  # palette-info: color
    body = b"".join(
        _rle_row(rows[r].reshape(-1)) for r in range(h)
    )
    return bytes(hdr) + body + tail
