"""Multimodal table operators: audio + video columns at Spark scale.

Mirrors the image pipeline's shape for the other modalities the
training-data pipeline needs (task brief: "treat image/audio/video as
opaque binary columns with typed metadata; decode / feature-extract /
frame-sample as UDFs over mapInPandas"). The synthesis path is
distributed (mapInPandas over a range — same prefix-stable discipline
as `synth/images.py`); decode + features run per Arrow batch.

Schemas:
  audio(audio_id string, wav binary, n_samples int, rate int, label string)
  video(video_id string, fvid binary, w int, h int, n_frames int)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.media import (
    audio_features,
    decode_fvid_frame,
    decode_wav,
    encode_fvid,
    encode_wav,
    fvid_meta,
    synth_audio,
    synth_video,
)

AUDIO_SCHEMA = "audio_id string, wav binary, n_samples int, rate int, label string"
VIDEO_SCHEMA = "video_id string, fvid binary, w int, h int, n_frames int"

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, rms double, zcr double, spectral_centroid double"
)
FRAME_SCHEMA = "video_id string, frame_idx int, mean_r double, mean_g double, mean_b double"


def audio_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                s = synth_audio(i)
                rows.append(
                    (f"aud_{i:08d}", encode_wav(s), len(s), 8000,
                     "tone" if i % 3 else "noise")
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "wav", "n_samples", "rate", "label"]
            )

    return spark.range(0, n, 1, parts).mapInPandas(gen, AUDIO_SCHEMA)


def video_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                frames = synth_video(i)
                blob = encode_fvid(frames)
                w, h, nf = fvid_meta(blob)
                rows.append((f"vid_{i:08d}", blob, w, h, nf))
            yield pd.DataFrame(
                rows, columns=["video_id", "fvid", "w", "h", "n_frames"]
            )

    return spark.range(0, n, 1, parts).mapInPandas(gen, VIDEO_SCHEMA)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """decode WAV -> DSP features, one Arrow batch at a time."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for aid, blob in zip(pdf["audio_id"], pdf["wav"]):
                samples, rate = decode_wav(bytes(blob))
                f = audio_features(samples, rate)
                rows.append((aid, f["rms"], f["zcr"], f["spectral_centroid"]))
            yield pd.DataFrame(
                rows, columns=["audio_id", "rms", "zcr", "spectral_centroid"]
            )

    return audio.select("audio_id", "wav").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(video: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling: decode ONLY frames 0, k, 2k, ... per video (index
    seek — O(frames decoded), never the whole stream) and emit per-frame
    channel means. The 100TB contract: a 2-hour clip costs as much as
    the handful of frames you actually sample."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for vid, blob, nf in zip(pdf["video_id"], pdf["fvid"], pdf["n_frames"]):
                blob = bytes(blob)
                for idx in range(0, int(nf), every_k):
                    px = decode_fvid_frame(blob, idx)
                    rows.append(
                        (vid, idx,
                         float(px[:, :, 0].mean()),
                         float(px[:, :, 1].mean()),
                         float(px[:, :, 2].mean()))
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "mean_r", "mean_g", "mean_b"]
            )

    return video.select("video_id", "fvid", "n_frames").mapInPandas(run, FRAME_SCHEMA)
