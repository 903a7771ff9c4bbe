#!/usr/bin/env python
"""Multimodal-curation release job: every media table in one pass.

spark-submit --py-files dist/dstlr_spark.zip jobs/media_report.py \
    --sf-dir /root/testdata/sf0.1 --output /path/media_report

Emits the media-layer tables a multimodal training-data release ships
(the decode/feature/dedup surface of SURVEY.md §2.12, composed exactly
like jobs/graph_report.py composes the KG layer):

  sniff/        magic-prefix media types + byte stats (mm_media_sniff)
  meta/         typed header metadata — dims, digests (mm_media_meta)
  features/     byte-histogram features (mm_media_features)
  decode/       decoded dims + pixel checksums + thumbnails
                (mm_media_decode — twenty-two codec variants)
  exact_dedup/  payload-digest duplicate groups (mm_media_dedup)
  phash_dedup/  cross-codec perceptual near-dup groups (mm_phash_groups)
  audio/        exact integer clip features from PCM decode
                (mm_audio_features)
  audio_norm/   mono-16 kHz normalization proof features over the
                nine-container audio corpus (audio_normalize_np)
  vad/          voice-activity segments from decoded samples
                (mm_audio_vad — planted-silence corpus)
  shots/        shot boundaries from decoded luma deltas
                (mm_video_shots — planted-scene corpus)
  video/        per-sampled-frame luma features from Y4M decode
                (mm_video_frames)
  image_std/    center-crop + fixed-square resize proof features over
                the 22-codec image corpus (image_standardize_np)
  frames/       deterministic frame-sampling schedule (mm_frame_schedule)

Every table is produced by the same oracle-gated operators the driver
value-checks — this job is their composition, not a re-implementation.
The decode stage runs in-executor (Arrow-batched mapInPandas); only
keys, features, and checksums are written, never pixel planes.
"""

from __future__ import annotations

import argparse

from dstlr_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = get_spark("dstlr-media-report")
    from dstlr_spark.queries.multimodal import (
        q_audio_features,
        q_audio_vad,
        q_frame_schedule,
        q_media_decode,
        q_media_dedup,
        q_media_features,
        q_media_meta,
        q_media_sniff,
        q_video_shots,
        q_phash_groups,
        q_video_frames,
    )

    from dstlr_spark.operators.multimodal import (
        audio_normalize_np,
        image_standardize_np,
        synth_media_mixed,
        synth_media_wav,
    )

    def q_audio_norm(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return audio_normalize_np(synth_media_wav(docs))

    def q_image_std(spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return image_standardize_np(synth_media_mixed(docs), side=4)

    tables = {
        "sniff": q_media_sniff,
        "meta": q_media_meta,
        "features": q_media_features,
        "decode": q_media_decode,
        "exact_dedup": q_media_dedup,
        "phash_dedup": q_phash_groups,
        "audio": q_audio_features,
        "audio_norm": q_audio_norm,
        "vad": q_audio_vad,
        "shots": q_video_shots,
        "video": q_video_frames,
        "image_std": q_image_std,
        "frames": q_frame_schedule,
    }
    for name, q in tables.items():
        df = q(spark, args.sf_dir)
        df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        print(f"{name}: {spark.read.parquet(f'{args.output}/{name}').count()} rows")


if __name__ == "__main__":
    main()
