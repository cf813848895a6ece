"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the codec inside the batch
function is the deterministic fake from `functions.images` because the
container ships no image/audio libraries. `decode_real` raises
NotImplementedError by design — swapping it in changes no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facebook_crawler_spark.functions import images as img

FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, phash long, "
    "mean_r double, mean_g double, mean_b double, ok boolean"
)


def decode_features(df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode → feature-extract over Arrow batches (mapInPandas).

    Emits per-image metadata + channel-mean features + recomputed phash.
    Corrupt payloads yield ok=false rows instead of failing the task —
    at 100 TB a poison row must not kill a 10-hour job.
    """
    cols = df.select(F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "fmt", "phash", "mean_r", "mean_g", "mean_b", "ok")}
            for iid, buf in zip(pdf["image_id"], pdf["bytes"]):
                out["image_id"].append(iid)
                try:
                    fmt, arr = img.decode(bytes(buf))
                    means = arr.reshape(-1, 3).mean(axis=0)
                    out["w"].append(arr.shape[1])
                    out["h"].append(arr.shape[0])
                    out["fmt"].append(fmt)
                    out["phash"].append(img.phash64(arr))
                    out["mean_r"].append(float(means[0]))
                    out["mean_g"].append(float(means[1]))
                    out["mean_b"].append(float(means[2]))
                    out["ok"].append(True)
                except Exception:
                    out["w"].append(0)
                    out["h"].append(0)
                    out["fmt"].append("corrupt")
                    out["phash"].append(0)
                    out["mean_r"].append(0.0)
                    out["mean_g"].append(0.0)
                    out["mean_b"].append(0.0)
                    out["ok"].append(False)
            yield pd.DataFrame(
                {
                    "image_id": out["image_id"],
                    "w": pd.array(out["w"], dtype="int32"),
                    "h": pd.array(out["h"], dtype="int32"),
                    "fmt": out["fmt"],
                    "phash": pd.array(out["phash"], dtype="int64"),
                    "mean_r": out["mean_r"],
                    "mean_g": out["mean_g"],
                    "mean_b": out["mean_b"],
                    "ok": out["ok"],
                }
            )

    return cols.mapInPandas(extract, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize every image to (out_w, out_h); re-encoded lossless."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for buf in pdf["bytes"]:
                _, arr = img.decode(bytes(buf))
                resized.append(img.encode(img.resize_block_mean(arr, out_w, out_h), "png"))
            yield pd.DataFrame({"image_id": pdf["image_id"], "bytes": resized})

    return df.select("image_id", "bytes").mapInPandas(run, "image_id string, bytes binary")


def sample_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video binary columns.

    The real decoder (ffmpeg) is absent; a deterministic fake treats the
    binary as a sequence of fixed-size 'frames' so partitioning, fan-out
    (one row per sampled frame), and Arrow batch shapes are exercised
    end-to-end. Swap `_fake_frames` for an ffmpeg call later.
    """

    def _fake_frames(buf: bytes) -> list[bytes]:
        frame_size = 64
        return [buf[i : i + frame_size] for i in range(0, len(buf), frame_size * every_n)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid, buf in zip(pdf["video_id"], pdf["bytes"]):
                for i, fr in enumerate(_fake_frames(bytes(buf))):
                    ids.append(vid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"video_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    return df.select("video_id", "bytes").mapInPandas(run, "video_id string, frame_idx int, frame binary")


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio feature plumbing: binary → fixed-length feature vector.

    Real decode (soundfile/librosa) unavailable → deterministic fake:
    interpret bytes as int8 PCM and emit 4 moments. NotImplementedError
    marks the real path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["bytes"]:
                x = np.frombuffer(bytes(buf), dtype=np.int8).astype(np.float64)
                if x.size == 0:
                    feats.append([0.0, 0.0, 0.0, 0.0])
                else:
                    feats.append([float(x.mean()), float(x.std()), float(x.min()), float(x.max())])
            yield pd.DataFrame({"audio_id": pdf["audio_id"], "features": feats})

    return df.select("audio_id", "bytes").mapInPandas(run, "audio_id string, features array<double>")


def decode_real_audio(buf: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError("real audio decode requires soundfile/librosa; not in this container")
