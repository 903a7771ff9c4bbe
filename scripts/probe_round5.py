#!/usr/bin/env python
"""Scale probes for the round-5 additions (BENCH/BASELINE.md evidence).

1. Multi-anchor batch BFS (`kg_entity_distances_batch` shape): on a
   deterministic pseudo-random graph (N vertices, ~6N directed edge
   slots built from hash arithmetic — no driver-side generation), time
   ONE batch traversal from K seeds vs single-anchor traversals, and
   report the measured batch-vs-K-singles advantage. The claim under
   test: K point lookups pay ~one graph traversal, not K.

2. Real BMP decode throughput (`mm_media_decode` operators at media
   size): synthesize W×H 24-bit BMPs per doc IN the executors
   (mapInPandas), then decode + thumbnail with the pure-NumPy path and
   reduce to per-doc checksums — the shape a real multimodal curation
   stage runs. Reports imgs/s and decoded MB/s.

Usage: python scripts/probe_round5.py [n_vertices] [n_docs] [side]
Defaults: 100000 vertices, 20000 docs, 96 px.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dstlr_spark.session import get_spark  # noqa: E402


def probe_batch_bfs(spark, n_vertices: int, k_seeds: int = 64) -> None:
    from dstlr_spark.queries.doc_kg import entity_distances

    # deterministic pseudo-random 6-regular-ish multigraph: vertex i
    # links to xxhash64(i, salt) mod N for 6 salts — built entirely
    # from range() + column arithmetic, no data ships from the driver
    v = spark.range(n_vertices).select(F.col("id").cast("string").alias("src"),
                                       F.col("id").alias("i"))
    edges = None
    for salt in range(6):
        e = v.select(
            "src",
            F.pmod(F.xxhash64(F.col("i"), F.lit(salt)), F.lit(n_vertices))
            .cast("string")
            .alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        edges = e if edges is None else edges.unionByName(e)
    edges = edges.distinct().localCheckpoint()
    n_edges = edges.count()
    print(f"graph: {n_vertices} vertices, {n_edges} undirectable edges")

    seeds = [str((i * 7919) % n_vertices) for i in range(k_seeds)]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id string")

    t0 = time.perf_counter()
    n_batch = entity_distances(edges, anchors=sdf).count()
    t_batch = time.perf_counter() - t0
    print(f"batch BFS  K={k_seeds}: {t_batch:.2f}s, {n_batch} (seed,entity,hops) rows")

    singles = []
    for s in seeds[:4]:
        t0 = time.perf_counter()
        entity_distances(edges, anchor=s).count()
        singles.append(time.perf_counter() - t0)
    t_single = sum(singles) / len(singles)
    print(
        f"anchored BFS mean of 4: {t_single:.2f}s → K-singles estimate "
        f"{t_single * k_seeds:.1f}s; batch advantage "
        f"{t_single * k_seeds / t_batch:.1f}x"
    )


def probe_bmp_decode(spark, n_docs: int, side: int) -> None:
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        decode_features_np,
        decode_image_np,
        resize_image_np,
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.multimodal import _planted_rgb, encode_bmp

        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                w = side + int(doc_id) % 7
                h = side + (int(doc_id) * 3) % 7
                rows.append(
                    dict(doc_id=str(doc_id), payload=encode_bmp(_planted_rgb(w, h)))
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {"doc_id": pd.Series(dtype="object"),
                 "payload": pd.Series(dtype="object")}
            )

    media = (
        spark.range(n_docs)
        .repartition(32)
        .mapInPandas(synth, "doc_id string, payload binary")
        .localCheckpoint()
    )
    total_bytes = media.select(F.sum(F.length("payload"))).collect()[0][0]
    print(f"media: {n_docs} BMPs ~{side}px, {total_bytes / 1e6:.1f} MB")

    pixel_sum = F.aggregate(
        F.col("pixels"), F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
    )
    t0 = time.perf_counter()
    n = (
        decode_image_np(media)
        .select("doc_id", "width", "height", pixel_sum.alias("pixel_sum"))
        .count()
    )
    t_dec = time.perf_counter() - t0
    print(
        f"decode:        {t_dec:.2f}s  {n / t_dec:,.0f} imgs/s  "
        f"{total_bytes / t_dec / 1e6:.1f} MB/s"
    )

    t0 = time.perf_counter()
    n = decode_features_np(media).count()
    t_feat = time.perf_counter() - t0
    print(
        f"decode→feats:  {t_feat:.2f}s  {n / t_feat:,.0f} imgs/s  "
        f"{total_bytes / t_feat / 1e6:.1f} MB/s  (in-stage reduce, no pixel ship)"
    )

    t0 = time.perf_counter()
    n = (
        resize_image_np(media, max_side=64)
        .select("doc_id", "width", "height", pixel_sum.alias("thumb_sum"))
        .count()
    )
    t_th = time.perf_counter() - t0
    print(
        f"decode+resize: {t_th:.2f}s  {n / t_th:,.0f} imgs/s  "
        f"{total_bytes / t_th / 1e6:.1f} MB/s"
    )


def probe_codecs(spark, n_docs: int) -> None:
    """3. Late-round-5 codec throughput at realistic payload sizes:
    PNG (96px-ish planted images, all five scanline filters), PCM WAV
    (1-second 16 kHz mono clips), Y4M (16 frames of 64×64 mono).
    Every stage is synth-in-executor → decode → in-stage reduce, the
    decode_features_np shape (payloads and samples never leave the
    stage)."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        audio_features_np,
        decode_features_np,
        video_frame_features_np,
    )

    def run(label, synth_body, ddl, op):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth_body, ddl)
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = op(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} clips/s  {total / dt / 1e6:.1f} MB/s"
        )

    def synth_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.multimodal import _planted_rgb, encode_png

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_png(_planted_rgb(96 + int(i) % 7,
                                                     96 + (int(i) * 3) % 7)))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    def synth_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dstlr_spark.operators.multimodal import encode_wav

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                idx = np.arange(16_000, dtype=np.int64)
                s = ((int(i) * 31 + idx * 17) % 4097 - 2048).astype(np.int16)
                rows.append(dict(doc_id=str(i), payload=encode_wav(s, 16_000)))
            yield pd.DataFrame(rows)

    def synth_y4m(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dstlr_spark.operators.multimodal import encode_y4m

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                fs, ys, xs = np.mgrid[0:16, 0:64, 0:64]
                fr = ((5 * xs + 3 * ys + 7 * fs + int(i)) % 241).astype(np.uint8)
                rows.append(dict(doc_id=str(i), payload=encode_y4m(fr)))
            yield pd.DataFrame(rows)

    def synth_png_adam7(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.multimodal import _planted_rgb, encode_png

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_png(_planted_rgb(96 + int(i) % 7,
                                                     96 + (int(i) * 3) % 7),
                                        interlace=True))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    def _gif_rows(pdf, interlace):
        import numpy as np

        from dstlr_spark.operators.multimodal import encode_gif

        pal = (np.arange(256 * 3, dtype=np.uint16) % 256).astype(np.uint8)
        pal = pal.reshape(256, 3)
        rows = []
        for i in pdf["id"]:
            w, h = 96 + int(i) % 7, 96 + (int(i) * 3) % 7
            ys, xs = np.mgrid[0:h, 0:w]
            idx = ((3 * xs + 7 * ys + int(i)) % 251).astype(np.uint8)
            rows.append(
                dict(doc_id=str(i), payload=encode_gif(idx, pal, interlace))
            )
        return pd.DataFrame(rows)

    def synth_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gif_rows(pdf, False)

    def synth_gif_il(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gif_rows(pdf, True)

    def synth_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.jpeg import encode_jpeg
        from dstlr_spark.operators.multimodal import _planted_rgb

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_jpeg(_planted_rgb(96 + int(i) % 7,
                                                      96 + (int(i) * 3) % 7),
                                         subsample="420"))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    def synth_jpeg_prog(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.jpeg import encode_jpeg_progressive
        from dstlr_spark.operators.multimodal import _planted_rgb

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_jpeg_progressive(
                         _planted_rgb(96 + int(i) % 7,
                                      96 + (int(i) * 3) % 7),
                         subsample="420"))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    def synth_jpeg_ls(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.jpeg import encode_jpeg_lossless
        from dstlr_spark.operators.multimodal import _planted_rgb

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_jpeg_lossless(
                         _planted_rgb(96 + int(i) % 7,
                                      96 + (int(i) * 3) % 7)))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    def synth_jpeg_qm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.jpeg_arith import encode_jpeg_arith
        from dstlr_spark.operators.multimodal import _planted_rgb

        for pdf in batches:
            rows = [
                dict(doc_id=str(i),
                     payload=encode_jpeg_arith(
                         _planted_rgb(96 + int(i) % 7,
                                      96 + (int(i) * 3) % 7),
                         subsample="420"))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    ddl = "doc_id string, payload binary"
    run("png decode→feats ", synth_png, ddl, decode_features_np)
    run("png adam7 → feats", synth_png_adam7, ddl, decode_features_np)
    run("gif decode→feats ", synth_gif, ddl, decode_features_np)
    run("gif ilace → feats", synth_gif_il, ddl, decode_features_np)
    run("jpeg 420 → feats ", synth_jpeg, ddl, decode_features_np)
    run("jpeg prog → feats", synth_jpeg_prog, ddl, decode_features_np)
    run("jpeg ls   → feats", synth_jpeg_ls, ddl, decode_features_np)
    run("jpeg arith→ feats", synth_jpeg_qm, ddl, decode_features_np)
    run("wav decode→feats ", synth_wav, ddl, audio_features_np)
    run("y4m decode→frames", synth_y4m, ddl, video_frame_features_np)


def probe_hier_codecs(spark, n_docs: int) -> None:
    """4. Hierarchical-JPEG decode throughput, sequential vs
    PROGRESSIVE frames (the final T.81 frame family): baseline JPEG
    as the within-window anchor, then 3-level DCT pyramids (quant=1
    worst case, no lossless closer so the cost measured is the frame
    machinery itself) under both scan disciplines. Same
    synth-in-executor → decode_features_np in-stage-reduce shape as
    the main codec window."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import decode_features_np

    def run(label, synth_body, op):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth_body, "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = op(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} clips/s  {total / dt / 1e6:.1f} MB/s"
        )

    def synth_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dstlr_spark.operators.jpeg import encode_jpeg
        from dstlr_spark.operators.multimodal import _planted_rgb

        for pdf in batches:
            yield pd.DataFrame(
                [dict(doc_id=str(i),
                      payload=encode_jpeg(_planted_rgb(96 + int(i) % 7,
                                                       96 + (int(i) * 3) % 7),
                                          subsample="420"))
                 for i in pdf["id"]]
            )

    def _synth_hier(progressive):
        def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.jpeg_hier import encode_jpeg_hier_dct
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=encode_jpeg_hier_dct(
                              _planted_rgb(96 + int(i) % 7,
                                           96 + (int(i) * 3) % 7),
                              levels=3, progressive=progressive))
                     for i in pdf["id"]]
                )

        return synth

    def _synth_ls(sampling):
        def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.jpeg import encode_jpeg_lossless
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=encode_jpeg_lossless(
                              _planted_rgb(96 + int(i) % 7,
                                           96 + (int(i) * 3) % 7),
                              sampling=sampling))
                     for i in pdf["id"]]
                )

        return synth

    run("jpeg 420 → feats  ", synth_jpeg, decode_features_np)
    run("jpeg hier seq→fts ", _synth_hier(False), decode_features_np)
    run("jpeg hier prog→fts", _synth_hier(True), decode_features_np)
    run("jpeg ls 444 → fts ", _synth_ls(None), decode_features_np)
    run("jpeg ls 420 → fts ", _synth_ls([(2, 2), (1, 1), (1, 1)]),
        decode_features_np)


def probe_tail_codecs(spark, n_docs: int, side: int = 96) -> None:
    """Final-tail codec throughput (RLE8/bitfields BMP, MS/IMA ADPCM
    WAV, wide-sample Y4M) beside a same-window 24-bit BMP / PCM-WAV /
    8-bit-Y4M baseline — synth-in-executor → decode → in-stage reduce
    (the decode_features_np shape), like probe_codecs."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        audio_features_np,
        decode_features_np,
        video_frame_features_np,
    )

    def run(label, synth_body, op):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth_body, "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = op(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} clips/s  {total / dt / 1e6:.1f} MB/s"
        )
        # checkpointed payloads accumulate across runs (GBs here) —
        # dropping them keeps each row's measurement free of the
        # predecessors' memory pressure
        media.unpersist(True)

    def synth_img(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=enc(_planted_rgb(side + int(i) % 7,
                                                   side + (int(i) * 3) % 7)))
                     for i in pdf["id"]]
                )

        return body

    def synth_wav(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    idx = np.arange(16_000, dtype=np.int64)
                    s = ((int(i) * 31 + idx * 17) % 4097 - 2048).astype(
                        np.int16
                    )
                    rows.append(dict(doc_id=str(i), payload=enc(s)))
                yield pd.DataFrame(rows)

        return body

    def synth_y4m(cs):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            from dstlr_spark.operators.multimodal import encode_y4m

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    fs, ys, xs = np.mgrid[0:16, 0:64, 0:64]
                    fr = ((5 * xs + 3 * ys + 7 * fs + int(i)) % 241)
                    rows.append(
                        dict(doc_id=str(i),
                             payload=encode_y4m(fr, colorspace=cs))
                    )
                yield pd.DataFrame(rows)

        return body

    from dstlr_spark.operators.multimodal import (
        encode_bmp,
        encode_bmp_bitfields,
        encode_bmp_rle,
        encode_wav,
        encode_wav_ima,
        encode_wav_ms,
        palettize_rgb,
    )

    run("bmp 24-bit → fts  ", synth_img(encode_bmp), decode_features_np)
    run("bmp RLE8 → fts    ",
        synth_img(lambda a: encode_bmp_rle(*palettize_rgb(a))),
        decode_features_np)
    run("bmp bitfields→fts ",
        synth_img(lambda a: encode_bmp_bitfields(
            a, (0xFF0000, 0xFF00, 0xFF), bpp=32)),
        decode_features_np)
    run("wav pcm → feats   ", synth_wav(lambda s: encode_wav(s, 16_000)),
        audio_features_np)
    run("wav ima-adpcm→fts ", synth_wav(lambda s: encode_wav_ima(s, 16_000)),
        audio_features_np)
    run("wav ms-adpcm →fts ", synth_wav(lambda s: encode_wav_ms(s, 16_000)),
        audio_features_np)
    run("y4m mono 8b → fts ", synth_y4m("Cmono"), video_frame_features_np)
    run("y4m mono10 → fts  ", synth_y4m("Cmono10"), video_frame_features_np)


def probe_flac(spark, n_docs: int) -> None:
    """FLAC decode throughput (closing session) beside the same-window
    PCM baseline — 1 s @ 16 kHz clips, production-shaped 4096-sample
    blocks, fixed-order-2 + Rice vs verbatim subframes; the same
    synth-in-executor → decode → in-stage-reduce shape as the codec
    tables in BENCH/BASELINE.md."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        audio_features_np,
        encode_wav,
    )

    def run(label, enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    idx = np.arange(16_000, dtype=np.int64)
                    s = ((int(i) * 31 + idx * 17) % 4097 - 2048).astype(
                        np.int64
                    )
                    rows.append(dict(doc_id=str(i), payload=enc(s)))
                yield pd.DataFrame(rows)

        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(body, "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = audio_features_np(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} clips/s  {total / dt / 1e6:.1f} MB/s"
        )
        media.unpersist(True)

    from dstlr_spark.operators.flac import encode_flac

    run("wav pcm → feats   ",
        lambda s: encode_wav(s.astype("int16"), 16_000))
    run("flac fixed2 → fts ",
        lambda s: encode_flac(s, 16_000, subframe="fixed2", blocksize=4096))
    run("flac verbatim→fts ",
        lambda s: encode_flac(s, 16_000, subframe="verbatim",
                              blocksize=4096))


def probe_tiff(spark, n_docs: int, side: int = 96) -> None:
    """TIFF decode throughput (closing session) beside the 24-bit BMP
    baseline — uncompressed / PackBits / LZW+predictor strips at the
    same planted-image sizes as the tail-codec window."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import decode_features_np

    def synth(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=enc(_planted_rgb(side + int(i) % 7,
                                                   side + (int(i) * 3) % 7)))
                     for i in pdf["id"]]
                )

        return body

    def run(label, enc):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth(enc), "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = decode_features_np(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} imgs/s  {total / dt / 1e6:.1f} MB/s"
        )
        media.unpersist(True)

    from dstlr_spark.operators.multimodal import encode_bmp
    from dstlr_spark.operators.tiff import encode_tiff

    run("bmp 24-bit (base) ", encode_bmp)
    run("tiff uncompressed ", lambda a: encode_tiff(a))
    run("tiff packbits     ", lambda a: encode_tiff(a, compression=32773))
    run("tiff lzw+predictor", lambda a: encode_tiff(
        a, compression=5, predictor=2))
    run("tiff jpeg strips  ", lambda a: encode_tiff(
        a, compression=7, rows_per_strip=32))


def probe_containers(spark, n_docs: int, side: int = 96) -> None:
    """New-container decode throughput (final session) beside the
    in-family baselines: TGA/PCX/QOI vs 24-bit BMP, AIFF/AU vs PCM
    WAV, AVI-DIB/AVI-MJPEG-lossless vs mono Y4M — the same
    synth-in-executor → decode → in-stage-reduce shape as every codec
    table in BENCH/BASELINE.md."""
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        audio_features_np,
        decode_features_np,
        encode_bmp,
        encode_wav,
        encode_y4m,
        video_frame_features_np,
    )

    def run(label, synth_body, op, unit):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth_body, "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = op(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} {unit}/s  "
            f"{total / dt / 1e6:.1f} MB/s"
        )
        media.unpersist(True)

    def synth_img(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=enc(_planted_rgb(side + int(i) % 7,
                                                   side + (int(i) * 3) % 7)))
                     for i in pdf["id"]]
                )

        return body

    def synth_audio(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    idx = np.arange(16_000, dtype=np.int64)
                    s = ((int(i) * 31 + idx * 17) % 4097 - 2048).astype(
                        np.int16
                    )
                    rows.append(dict(doc_id=str(i), payload=enc(s)))
                yield pd.DataFrame(rows)

        return body

    def synth_video(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    n = int(i)
                    # 8 frames of side/3-square planted luma per clip
                    d = side // 3
                    fs, ys, xs = np.mgrid[0:8, 0:d, 0:d]
                    fr = ((5 * xs + 3 * ys + 7 * fs + n) % 241).astype(
                        np.uint8
                    )
                    rows.append(dict(doc_id=str(i), payload=enc(fr)))
                yield pd.DataFrame(rows)

        return body

    from dstlr_spark.operators.aiff import encode_aiff, encode_au
    from dstlr_spark.operators.avi import encode_avi
    from dstlr_spark.operators.jpeg import encode_jpeg_lossless
    from dstlr_spark.operators.pcx import encode_pcx
    from dstlr_spark.operators.qoi import encode_qoi
    from dstlr_spark.operators.tga import encode_tga

    run("bmp 24-bit (base) ", synth_img(encode_bmp),
        decode_features_np, "imgs")
    run("tga rle bottom-up ",
        synth_img(lambda a: encode_tga(a, rle=True, top_down=False)),
        decode_features_np, "imgs")
    run("pcx 3-plane rle   ", synth_img(lambda a: encode_pcx(rgb=a)),
        decode_features_np, "imgs")
    run("qoi               ", synth_img(encode_qoi),
        decode_features_np, "imgs")
    from dstlr_spark.operators.webp import encode_webp

    run("webp vp8l sg+cache",
        synth_img(lambda a: encode_webp(a, subtract_green=True,
                                        cache_bits=8)),
        decode_features_np, "imgs")
    from dstlr_spark.operators.ico import encode_ico

    run("ico dib (256px cap)",
        synth_img(lambda a: encode_ico(a[:256, :256])),
        decode_features_np, "imgs")
    run("wav pcm (base)    ",
        synth_audio(lambda s: encode_wav(s, 16_000)),
        audio_features_np, "clips")
    run("aiff be pcm       ", synth_audio(lambda s: encode_aiff(s, 16_000)),
        audio_features_np, "clips")
    run("aifc sowt         ",
        synth_audio(lambda s: encode_aiff(s, 16_000, compression="sowt")),
        audio_features_np, "clips")
    run("au be pcm         ", synth_audio(lambda s: encode_au(s, 16_000)),
        audio_features_np, "clips")
    from dstlr_spark.operators.caf import encode_caf, encode_rf64, encode_w64

    run("caf lpcm be       ", synth_audio(lambda s: encode_caf(s, 16_000)),
        audio_features_np, "clips")
    run("w64 pcm           ", synth_audio(lambda s: encode_w64(s, 16_000)),
        audio_features_np, "clips")
    run("rf64 pcm          ", synth_audio(lambda s: encode_rf64(s, 16_000)),
        audio_features_np, "clips")
    run("y4m mono (base)   ", synth_video(encode_y4m),
        video_frame_features_np, "clips")
    run("avi dib 24-bit    ",
        synth_video(lambda fr: encode_avi(
            __import__("numpy").repeat(fr[..., None], 3, axis=-1))),
        video_frame_features_np, "clips")
    run("avi mjpeg sof3    ",
        synth_video(lambda fr: encode_avi(
            __import__("numpy").repeat(fr[..., None], 3, axis=-1),
            codec="MJPG",
            jpeg_encoder=lambda a: encode_jpeg_lossless(a, predictor=4))),
        video_frame_features_np, "clips")


def probe_newpaths(spark, n_docs: int, side: int = 96) -> None:
    """Throughput rows for the hand-off-session decode additions
    (AIFC/CAF ima4, float/signed TIFF) beside their in-family
    baselines — same synth-in-executor → decode → in-stage-reduce
    shape as every codec table in BENCH/BASELINE.md."""
    import struct as st
    from typing import Iterator

    import pandas as pd

    from dstlr_spark.operators.multimodal import (
        audio_features_np,
        decode_features_np,
        encode_bmp,
        encode_wav,
    )

    def run(label, synth_body, op, unit):
        media = (
            spark.range(n_docs)
            .repartition(32)
            .mapInPandas(synth_body, "doc_id string, payload binary")
            .localCheckpoint()
        )
        total = media.select(F.sum(F.length("payload"))).collect()[0][0]
        t0 = time.perf_counter()
        n = op(media).count()
        dt = time.perf_counter() - t0
        print(
            f"{label}: {n_docs} payloads {total / 1e6:.1f} MB → {n} rows in "
            f"{dt:.2f}s  {n_docs / dt:,.0f} {unit}/s  "
            f"{total / dt / 1e6:.1f} MB/s"
        )
        media.unpersist(True)

    def synth_audio(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    idx = np.arange(16_000, dtype=np.int64)
                    s = ((int(i) * 31 + idx * 17) % 4097 - 2048).astype(
                        np.int16
                    )
                    rows.append(dict(doc_id=str(i), payload=enc(s)))
                yield pd.DataFrame(rows)

        return body

    def _caf_ima4(s):
        import numpy as np

        from dstlr_spark.operators.aiff import _ima4_encode_packets

        npk = -(-s.size // 64)
        chan = np.zeros(npk * 64, np.int32)
        chan[: s.size] = s
        pk = _ima4_encode_packets([chan], npk)
        desc = st.pack(">d4sIIIII", 16_000.0, b"ima4", 0, 34, 64, 1, 0)
        return (
            b"caff" + st.pack(">HH", 1, 0)
            + b"desc" + st.pack(">q", len(desc)) + desc
            + b"data" + st.pack(">q", 4 + len(pk)) + st.pack(">I", 0) + pk
        )

    def _ftiff(a, sfmt):
        """Minimal II TIFF around a planted (h, w, 3) array: f32 RGB
        (sfmt 3, values /255) or signed-16 gray (sfmt 2)."""
        import numpy as np

        h, w = a.shape[:2]
        if sfmt == 3:
            data = (a.astype(np.float32) / 255.0).astype("<f4").tobytes()
            bits, spp, photo = 32, 3, 2
        else:
            data = (
                a[..., 0].astype(np.int32) - 128
            ).astype("<i2").tobytes()
            bits, spp, photo = 16, 1, 1
        ntags = 11
        e = st.pack("<H", ntags)

        def tag(t, typ, cnt, val):
            return st.pack("<HHII", t, typ, cnt, val)

        data_at = 8 + 2 + ntags * 12 + 4
        e += tag(256, 3, 1, w) + tag(257, 3, 1, h)
        e += tag(258, 3, 1, bits) + tag(259, 3, 1, 1)
        e += tag(262, 3, 1, photo) + tag(273, 4, 1, data_at)
        e += tag(277, 3, 1, spp)
        e += tag(278, 3, 1, h) + tag(279, 4, 1, len(data))
        e += tag(317, 3, 1, 1) + tag(339, 3, 1, sfmt)
        e += st.pack("<I", 0)
        return b"II*\x00" + st.pack("<I", 8) + e + data

    def synth_img(enc):
        def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from dstlr_spark.operators.multimodal import _planted_rgb

            for pdf in batches:
                yield pd.DataFrame(
                    [dict(doc_id=str(i),
                          payload=enc(_planted_rgb(side + int(i) % 7,
                                                   side + (int(i) * 3) % 7)))
                     for i in pdf["id"]]
                )

        return body

    from dstlr_spark.operators.aiff import encode_aiff

    run("wav pcm (base)    ",
        synth_audio(lambda s: encode_wav(s, 16_000)),
        audio_features_np, "clips")
    run("aifc ima4         ",
        synth_audio(lambda s: encode_aiff(s, 16_000, compression="ima4")),
        audio_features_np, "clips")
    run("caf ima4          ", synth_audio(_caf_ima4),
        audio_features_np, "clips")
    run("bmp 24-bit (base) ", synth_img(encode_bmp),
        decode_features_np, "imgs")
    run("tiff f32 rgb      ", synth_img(lambda a: _ftiff(a, 3)),
        decode_features_np, "imgs")
    run("tiff signed16 gray", synth_img(lambda a: _ftiff(a, 2)),
        decode_features_np, "imgs")


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    side = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    only = sys.argv[4] if len(sys.argv) > 4 else "all"
    spark = get_spark("probe-r5", master="local[32]", shuffle_partitions=32)
    import __spark_entry__ as e

    e._ensure_workers_can_import(spark)
    if only in ("all", "bfs"):
        probe_batch_bfs(spark, n_vertices)
    if only in ("all", "bmp"):
        probe_bmp_decode(spark, n_docs, side)
    if only in ("all", "codecs"):
        probe_codecs(spark, n_docs)
    if only in ("all", "hier"):
        probe_hier_codecs(spark, n_docs)
    if only in ("all", "tail"):
        probe_tail_codecs(spark, n_docs, side)
    if only in ("all", "flac"):
        probe_flac(spark, n_docs)
    if only in ("all", "tiff"):
        probe_tiff(spark, n_docs, side)
    if only in ("all", "containers"):
        probe_containers(spark, n_docs, side)
    if only in ("all", "newpaths"):
        probe_newpaths(spark, n_docs, side)
    spark.stop()


if __name__ == "__main__":
    main()
