"""Multimodal columns: opaque binary payloads + typed metadata.

Engine addition for training-data pipelines (no reference analog):
image/audio/video travel as ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` UDFs.

This container has no image/audio libraries, so PIXEL decode is stubbed
(clearly marked ``NotImplementedError`` unless Pillow happens to be
importable) — but everything Spark-side is real and tested: the binary
schema, the header PARSERS (PNG IHDR / WAV fmt are pure byte-struct
reads, no codec needed), the batch shapes, and the partitioning.

Fixture: :func:`synth_media` builds deterministic fake PNGs from the
documents table with a REAL IHDR header (magic + length + 'IHDR' +
width/height int32-BE), so the Arrow header parser can be oracle-checked
against an independent derivation of the same dimensions.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PNG_MAGIC = "89504E470D0A1A0A"
_MEDIA_META_DDL = (
    "doc_id string, media_type string, n_bytes int, payload_md5 string, "
    "width int, height int"
)


def synth_media(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, n_chars) → media(doc_id, payload binary).

    Payload = PNG magic ‖ IHDR chunk (len, tag, width, height BE) ‖ text
    bytes; width/height are deterministic functions of n_chars so an
    oracle can re-derive them without parsing bytes."""
    width = (F.col("n_chars") % 512 + 1).cast("int")
    height = ((F.col("n_chars") * 7) % 512 + 1).cast("int")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))

    payload = F.concat(
        F.unhex(F.lit(PNG_MAGIC)),
        F.unhex(F.lit("0000000D")),  # IHDR length 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        be32(width),
        be32(height),
        F.encode(F.col("text"), "UTF-8"),
    )
    # F1/F2-style guard: a null-text/null-n_chars doc has no payload —
    # dropping it here keeps every downstream Arrow batch None-free
    return documents.where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        F.col("doc_id").cast("string").alias("doc_id"), payload.alias("payload")
    )


def sniff_media_type(payload) -> F.Column:
    """Magic-prefix sniffing — native expression, no UDF."""
    head8 = F.hex(F.substring(payload, 1, 8))
    head4 = F.hex(F.substring(payload, 1, 4))
    return (
        F.when(head8 == PNG_MAGIC, F.lit("image/png"))
        .when(head4 == "52494646", F.lit("audio/wav"))  # 'RIFF'
        .when(F.hex(F.substring(payload, 1, 3)) == "FFD8FF", F.lit("image/jpeg"))
        .otherwise(F.lit("application/octet-stream"))
    )


def _parse_header_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch body: parse PNG IHDR dims from raw bytes (pure struct
    read — works with no imaging library). Unknown formats → null dims."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # per-doc isolation (X2): skip, don't die
                continue
            b = bytes(payload)
            width = height = None
            mtype = "application/octet-stream"
            if b[:8] == bytes.fromhex(PNG_MAGIC) and len(b) >= 24:
                mtype = "image/png"
                width, height = struct.unpack(">II", b[16:24])
            elif b[:4] == b"RIFF":
                mtype = "audio/wav"
            elif b[:3] == b"\xff\xd8\xff":
                mtype = "image/jpeg"
            rows.append(
                dict(
                    doc_id=doc_id,
                    media_type=mtype,
                    n_bytes=len(b),
                    payload_md5=hashlib.md5(b.hex().upper().encode()).hexdigest(),
                    width=width,
                    height=height,
                )
            )
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in
             ["doc_id", "media_type", "n_bytes", "payload_md5", "width", "height"]}
        )


def media_metadata(media: DataFrame) -> DataFrame:
    """media(doc_id, payload) → typed metadata via the Arrow header parser."""
    return media.mapInPandas(_parse_header_batches, _MEDIA_META_DDL)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Pixel decode → (doc_id, width, height, pixels array<int>).

    Real decode needs an imaging library (not in this container):
    - Pillow importable → real decode;
    - ``fake=True``  → deterministic stand-in (pixels = first 16 payload
      bytes) exercising the full Spark plumbing;
    - otherwise → NotImplementedError, clearly marked (STUB).
    """
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not fake:
        raise NotImplementedError(
            "STUB: pixel decode requires Pillow (not in this container); "
            "pass fake=True for the deterministic plumbing test"
        )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if have_pil and not fake:
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(b))
                    out.append(
                        dict(doc_id=doc_id, width=img.width, height=img.height,
                             pixels=list(img.tobytes()[:16]))
                    )
                else:
                    w, h = (
                        struct.unpack(">II", b[16:24]) if len(b) >= 24 else (None, None)
                    )
                    out.append(
                        dict(doc_id=doc_id, width=w, height=h,
                             pixels=[int(x) for x in b[:16]])
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        body, "doc_id string, width int, height int, pixels array<int>"
    )


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction: byte-value histogram per payload → fixed-width
    ``array<int>`` feature vector. Unlike pixel decode this needs no
    codec, so the features are REAL (numpy bincount over the raw bytes);
    a model-based extractor drops into the same batch shape and schema.
    """
    import numpy as np

    width = 256 // n_bins

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # per-doc isolation (X2): skip, don't die
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_bins)[:n_bins]
                rows.append(dict(doc_id=doc_id, features=[int(x) for x in hist],
                                 n_bytes=len(arr)))
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        body, "doc_id string, features array<int>, n_bytes int"
    )


def resize_image(media: DataFrame, max_side: int = 64, fake: bool = False) -> DataFrame:
    """Resize → (doc_id, width, height, thumb binary).

    STUB without an imaging library (same gating contract as
    :func:`decode_image`); ``fake=True`` exercises the plumbing with a
    deterministic byte-stride 'thumbnail' of the payload.
    """
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not fake:
        raise NotImplementedError(
            "STUB: resize requires Pillow (not in this container); "
            "pass fake=True for the deterministic plumbing test"
        )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if have_pil and not fake:
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(b))
                    img.thumbnail((max_side, max_side))
                    out = io.BytesIO()
                    img.save(out, format="PNG")
                    rows.append(dict(doc_id=doc_id, width=img.width,
                                     height=img.height, thumb=out.getvalue()))
                else:
                    w, h = (
                        struct.unpack(">II", b[16:24]) if len(b) >= 24 else (0, 0)
                    )
                    scale = max(1, -(-max(w, h) // max_side)) if w and h else 1
                    rows.append(dict(doc_id=doc_id, width=(w // scale) or None,
                                     height=(h // scale) or None,
                                     thumb=b[::scale][:max_side]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        body, "doc_id string, width int, height int, thumb binary"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: deterministic byte-stride sampling of
    the payload (the video path swaps the stride for a codec GOP reader;
    batch shape and schema are what the engine guarantees)."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for k, i in enumerate(range(0, len(b), every_n_bytes)):
                    out.append(dict(doc_id=doc_id, frame_idx=k, byte_offset=i,
                                    sample=int(b[i])))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        body, "doc_id string, frame_idx int, byte_offset int, sample int"
    )
