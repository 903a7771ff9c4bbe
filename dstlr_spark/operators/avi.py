"""AVI (RIFF Audio Video Interleave) container decode/encode —
pure struct/NumPy.

AVI is the RIFF twin of the WAV walk the engine already does
(:func:`dstlr_spark.operators.multimodal.decode_wav`): nested LIST
chunks (``hdrl`` stream headers, ``movi`` frame payloads). This
module decodes the video stream of an AVI into the same
``(n, h, w, 3)`` RGB frame stack the animated-GIF path produces, so
:func:`dstlr_spark.operators.multimodal.decode_video_luma` can
dispatch on the RIFF/``AVI `` magic and every shot/sampling operator
stays container-blind.

Decoder surface (:func:`decode_avi_frames`):
- uncompressed DIB frames (``biCompression`` 0 = BI_RGB) at 24/32 bpp
  (bottom-up BGR(A) rows padded to 4 bytes — the BMP row rule — or
  top-down via negative ``biHeight``) and 8 bpp with the palette read
  from the ``strf`` color table;
- MJPEG frames (``MJPG``/``mjpg`` fourcc): each ``00dc`` chunk is a
  standalone JPEG stream delegated to :mod:`dstlr_spark.operators.
  jpeg` — with LOSSLESS (SOF3) frames the round-trip is bit-exact,
  which is what lets an AVI variant sit under the planted-value video
  oracle (the same embedded-stream trick as BI_JPEG BMP and
  JPEG-in-TIFF);
- ``LIST rec `` interleave groups inside ``movi`` are walked
  transparently; non-video chunks (``01wb`` audio, ``ix..`` indexes)
  are skipped; ``idx1`` is not required (the frames are read in
  stream order).

True inter-frame codecs (cvid, VP6, H.26x fourccs) raise
NotImplementedError. Malformed containers raise ValueError. Never
struct.error/IndexError — the Arrow isolation wrappers catch exactly
those two types.

Encoder (:func:`encode_avi`) is the deterministic FIXTURE side:
spec-shaped hdrl (avih + strl/strh/strf), movi with one chunk per
frame, and a standard idx1 index.

Scale shape: header walk + per-frame slicing, map-only; corpus
parallelism (one clip per row, Arrow-batched, frame features reduced
in-stage) is the 100 TB axis — the Y4M story.
"""

from __future__ import annotations

import struct


def _walk_riff(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len, list_type) over one
    chunk sequence; callers recurse into LISTs via the returned span."""
    while pos + 8 <= end:
        tag, ln = struct.unpack("<4sI", b[pos : pos + 8])
        start = pos + 8
        if start + ln > end:
            raise ValueError(f"truncated AVI chunk {tag!r}")
        if tag in (b"LIST", b"RIFF"):
            if ln < 4:
                raise ValueError("AVI LIST shorter than its type tag")
            yield tag, start + 4, ln - 4, b[start : start + 4]
        else:
            yield tag, start, ln, None
        pos = start + ln + (ln & 1)  # word-aligned


def _dib_frame(data: bytes, w: int, h: int, bpp: int, top_down: bool,
               palette=None):
    """One uncompressed DIB frame chunk → (h, w, 3) uint8 RGB."""
    import numpy as np

    if bpp == 8:
        row_bytes = (w + 3) & ~3
        raw = np.frombuffer(data[: row_bytes * h], np.uint8)
        if raw.size < row_bytes * h:
            raise ValueError("truncated DIB 8-bpp frame")
        idx = raw.reshape(h, row_bytes)[:, :w]
        if palette is None:
            raise ValueError("8-bpp DIB frame without strf palette")
        if int(idx.max(initial=0)) >= palette.shape[0]:
            # isolation contract: out-of-palette indices must be a
            # ValueError, never an IndexError escaping the Arrow batch
            raise ValueError("DIB frame index outside strf palette")
        rgb = palette[idx]
    elif bpp in (24, 32):
        nb = bpp // 8
        row_bytes = (w * nb + 3) & ~3
        raw = np.frombuffer(data[: row_bytes * h], np.uint8)
        if raw.size < row_bytes * h:
            raise ValueError(f"truncated DIB {bpp}-bpp frame")
        rows = raw.reshape(h, row_bytes)[:, : w * nb].reshape(h, w, nb)
        rgb = rows[..., 2::-1]
    else:
        raise NotImplementedError(f"STUB: DIB frame at {bpp} bpp")
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_avi_frames(b: bytes):
    """REAL AVI video decode → ((n, h, w, 3) uint8 RGB stack,
    (rate, scale) fps fraction)."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_len = struct.unpack("<I", b[4:8])[0]
    end = min(len(b), 8 + riff_len)

    stream_idx = -1
    vid_stream = None  # (two-digit id, fourcc handler, strf dict)
    fps = (25, 1)
    frames = []

    def parse_strl(span_start, span_len):
        nonlocal vid_stream, fps, stream_idx
        stream_idx += 1
        strh = strf = None
        for tag, s, ln, _lt in _walk_riff(b, span_start, span_start + span_len):
            if tag == b"strh":
                strh = b[s : s + ln]
            elif tag == b"strf":
                strf = b[s : s + ln]
        if strh is None or len(strh) < 32:
            raise ValueError("AVI strl missing/short strh")
        if strh[:4] != b"vids" or vid_stream is not None:
            return
        handler = strh[4:8]
        scale, rate = struct.unpack("<II", strh[20:28])
        if scale and rate:
            fps = (rate, scale)
        if strf is None or len(strf) < 40:
            raise ValueError("AVI video strl missing/short strf")
        bw, bh = struct.unpack("<ii", strf[4:12])
        bpp = struct.unpack("<H", strf[14:16])[0]
        comp = strf[16:20]
        palette = None
        if bpp == 8:
            n_colors = struct.unpack("<I", strf[32:36])[0] or 256
            quads = np.frombuffer(
                strf[40 : 40 + 4 * n_colors], np.uint8
            )
            if quads.size < 4 * n_colors:
                raise ValueError("AVI strf palette truncated")
            palette = quads.reshape(n_colors, 4)[:, 2::-1].copy()
        vid_stream = (f"{stream_idx:02d}".encode(), handler, bw, bh, bpp,
                      comp, palette)

    def parse_movi(span_start, span_len):
        prefix = vid_stream[0]
        for tag, s, ln, lt in _walk_riff(b, span_start, span_start + span_len):
            if tag == b"LIST" and lt == b"rec ":
                parse_movi(s, ln)
            elif tag[:2] == prefix and tag[2:] in (b"db", b"dc"):
                frames.append(b[s : s + ln])

    for tag, s, ln, lt in _walk_riff(b, 12, end):
        if tag != b"LIST":
            continue
        if lt == b"hdrl":
            for t2, s2, ln2, lt2 in _walk_riff(b, s, s + ln):
                if t2 == b"LIST" and lt2 == b"strl":
                    parse_strl(s2, ln2)
        elif lt == b"movi":
            if vid_stream is None:
                raise ValueError("AVI movi before any vids stream header")
            parse_movi(s, ln)

    if vid_stream is None:
        raise ValueError("AVI has no video (vids) stream")
    _, handler, bw, bh, bpp, comp, palette = vid_stream
    if not frames:
        raise ValueError("AVI video stream has zero frames")
    w, h, top_down = bw, abs(bh), bh < 0
    if w <= 0 or h == 0 or w * h > 1 << 26:
        # upper bound: reject mutated headers before the frame-stack
        # alloc can raise MemoryError (outside the isolation contract)
        raise ValueError(f"AVI frame dims {bw}x{bh} invalid")

    mjpg = comp in (b"MJPG", b"mjpg") or handler in (b"MJPG", b"mjpg")
    out = []
    if mjpg:
        from dstlr_spark.operators.jpeg import decode_jpeg

        for fr in frames:
            rgb = decode_jpeg(fr)
            if rgb.shape[:2] != (h, w):
                raise ValueError(
                    f"MJPEG frame {rgb.shape[:2]} != header {(h, w)}"
                )
            out.append(rgb)
    elif comp == b"\x00\x00\x00\x00":  # BI_RGB
        for fr in frames:
            out.append(_dib_frame(fr, w, h, bpp, top_down, palette))
    else:
        raise NotImplementedError(
            f"STUB: AVI compression {comp!r} is an inter-frame codec; "
            "BI_RGB DIB and MJPEG decode natively"
        )
    import numpy as np

    return np.stack(out), fps


def encode_avi(frames, fps=(25, 1), codec: str = "DIB ",
               jpeg_encoder=None, palette=None) -> bytes:
    """FIXTURE-side AVI encoder.

    ``codec="DIB "``: frames is an (n, h, w, 3) uint8 RGB array →
    bottom-up 24-bpp BGR chunks. ``codec="DIB8"``: frames is an
    (n, h, w) index array + ``palette`` (k, 3) → 8-bpp DIB with the
    strf color table. ``codec="MJPG"``: frames is the RGB array and
    each frame is serialized with ``jpeg_encoder`` (e.g.
    ``encode_jpeg_lossless`` for the exact-oracle corpus)."""
    import numpy as np

    fr = np.asarray(frames)
    n = fr.shape[0]
    if codec == "DIB8":
        h, w = fr.shape[1:3]
        bpp, comp, handler = 8, 0, b"DIB "
    else:
        h, w = fr.shape[1:3]
        bpp = 24
        comp, handler = (0, b"DIB ") if codec == "DIB " else (
            struct.unpack("<I", b"MJPG")[0],
            b"MJPG",
        )

    chunks = []
    for i in range(n):
        if codec == "MJPG":
            data = jpeg_encoder(fr[i])
            cid = b"00dc"
        elif codec == "DIB8":
            row_bytes = (w + 3) & ~3
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, :w] = fr[i][::-1]  # bottom-up
            data = rows.tobytes()
            cid = b"00db"
        else:
            row_bytes = (w * 3 + 3) & ~3
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, : w * 3] = fr[i][::-1, :, ::-1].reshape(h, w * 3)
            data = rows.tobytes()
            cid = b"00db"
        chunks.append((cid, data))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    rate, scale = fps
    us_per_frame = scale * 1_000_000 // rate
    max_bytes = max(len(d) for _, d in chunks)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, scale, rate, 0, n, max_bytes,
                      0xFFFFFFFF, 0, 0, 0, w, h)
    )
    if codec == "DIB8":
        pal = np.zeros((256, 3), np.uint8)
        p = np.asarray(palette, np.uint8)
        pal[: p.shape[0]] = p
        quads = np.zeros((256, 4), np.uint8)
        quads[:, :3] = pal[:, ::-1]
        strf = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, 0, 0, 0, 256, 0
        ) + quads.tobytes()
    else:
        strf = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
            len(chunks[0][1]), 0, 0, 0, 0,
        )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(cid, d) for cid, d in chunks)
    movi = list_chunk(b"movi", movi_body)
    # idx1: one entry per chunk, offsets relative to the movi list-type
    idx, off = [], 4
    for cid, d in chunks:
        idx.append(struct.pack("<4sIII", cid, 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
