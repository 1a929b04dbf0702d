"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched UDFs.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked); everything Spark-side — schemas,
partition-sized batching, UDF signatures, output shapes — is real and
tested, and a libjpeg/ffmpeg-backed decoder drops into ``_decode_rgb`` /
``_sample_frames`` unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append(
            (i, kind, f"application/x-fake-{kind}", 32 + i % 64, 24 + i % 48,
             1000 + 100 * i, bytearray(payload)),
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER — deterministic fake pixels derived from the payload:
    flat pixel j is byte ``j % 16`` of ``md5(hex(payload) + '|' + j // 16)``,
    an md5 byte stream that the DuckDB oracle twin replays with substr
    arithmetic (the reason it is not np.random).  Replace with PIL/libjpeg
    where available; the Spark plumbing (batch shape, schema, partitioning)
    is identical either way."""
    hexp = payload.hex()
    n = height * width * 3
    out = np.empty(n, dtype=np.uint8)
    for blk in range(0, (n + 15) // 16):
        digest = hashlib.md5(f"{hexp}|{blk}".encode()).digest()
        lo = blk * 16
        chunk = min(16, n - lo)
        out[lo : lo + chunk] = np.frombuffer(digest[:chunk], dtype=np.uint8)
    return out.reshape(height, width, 3)


_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mean_luma", DoubleType()),
        StructField("feat", ArrayType(DoubleType())),  # 16-dim pooled feature
    ]
)


def extract_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """decode -> band mean-pool (resize_to row-bands + resize_to col-bands,
    linspace-truncated boundaries) -> 2*resize_to-dim feature, Arrow-batched.

    Every emitted value is an exact integer-pixel sum divided by an exact
    count, so the float64 results are bit-identical across any summation
    order AND across engines (the DuckDB oracle twin reproduces them with
    AVG over the same md5 pixel stream — no rounding tolerance needed)."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, lumas, feats = [], [], [], []
            for mid, kind, w, h, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = _decode_rgb(bytes(payload), int(w), int(h))
                ys = np.linspace(0, img.shape[0], resize_to + 1, dtype=int)
                xs = np.linspace(0, img.shape[1], resize_to + 1, dtype=int)
                # zero-width bands (dim < resize_to duplicates linspace
                # boundaries) contribute an explicit 0.0 instead of 0/0
                col_means = [
                    int(img[:, xs[j]:xs[j+1], :].sum(dtype=np.int64))
                    / (img.shape[0] * int(xs[j+1] - xs[j]) * 3)
                    if xs[j+1] > xs[j] else 0.0
                    for j in range(resize_to)
                ]
                row_means = [
                    int(img[ys[i]:ys[i+1], :, :].sum(dtype=np.int64))
                    / (int(ys[i+1] - ys[i]) * img.shape[1] * 3)
                    if ys[i+1] > ys[i] else 0.0
                    for i in range(resize_to)
                ]
                luma = int(img.sum(dtype=np.int64)) / img.size
                ids.append(int(mid))
                kinds.append(kind)
                lumas.append(luma)
                feats.append(col_means + row_means)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "mean_luma": lumas, "feat": feats}
            )

    return media.mapInPandas(run, _FEAT_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (UDTF-shaped
    explode inside the Arrow UDF).  Frame bytes are stub-derived."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha": []}
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                # stub fingerprints hash the HEX payload (not raw bytes) so
                # the DuckDB oracle twin is expressible (sha256(VARCHAR));
                # a real decoder would hash the decoded frame bytes here
                hexp = bytes(payload).hex()
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    sha = hashlib.sha256((hexp + str(ts)).encode()).hexdigest()
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame_sha"].append(sha)
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(run, _FRAME_SCHEMA)
