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
import struct
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
    """STUB DECODER — deterministic fake pixels derived from the payload.
    Replace with PIL/libjpeg where available; the Spark plumbing (batch
    shape, schema, partitioning) is identical either way."""
    seed = struct.unpack("<Q", hashlib.sha256(payload).digest()[:8])[0]
    rng = np.random.RandomState(seed % (2**32))
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mean_luma", DoubleType()),
        StructField("feat", ArrayType(DoubleType())),  # 16-dim pooled feature
    ]
)


def extract_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """decode -> resize (mean-pool) -> global feature, Arrow-batched."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, lumas, feats = [], [], [], []
            for mid, kind, w, h, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = _decode_rgb(bytes(payload), int(w), int(h))
                # resize by block mean-pool to resize_to x resize_to
                ys = np.linspace(0, img.shape[0], resize_to + 1, dtype=int)
                xs = np.linspace(0, img.shape[1], resize_to + 1, dtype=int)
                pooled = np.array(
                    [
                        [img[ys[i]:ys[i+1], xs[j]:xs[j+1]].mean() for j in range(resize_to)]
                        for i in range(resize_to)
                    ]
                )
                luma = float(img.mean())
                # 16-dim: row + column means of the pooled map
                feat = np.concatenate([pooled.mean(axis=0), pooled.mean(axis=1)])
                ids.append(int(mid))
                kinds.append(kind)
                lumas.append(round(luma, 4))
                feats.append([round(float(v), 4) for v in feat])
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
