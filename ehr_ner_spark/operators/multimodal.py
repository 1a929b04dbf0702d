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


# Real container-format magic signatures (hex, uppercase).
MAGIC_HEX = {
    "image": "89504E470D0A1A0A",          # PNG
    "audio": "52494646" + "00000000" + "57415645",  # RIFF....WAVE
    "video": "00000018667479706D703432",  # mp4 ftyp box (mp42 brand)
}
JPEG_HEX = "FFD8FFE000104A464946"          # JFIF JPEG
NO_MAGIC_MOD = 7    # every 7th payload: raw bytes, no container header
JPEG_MOD = 11       # every 11th: a JPEG regardless of declared kind


def synth_media_magic(spark, n: int = 64) -> DataFrame:
    """:func:`synth_media` variant whose payloads start with REAL container
    magic bytes — PNG / RIFF-WAVE / mp4-ftyp by kind — so the sniffer below
    is exercised against true signatures.  Two deterministic fault classes:
    every ``NO_MAGIC_MOD``-th payload carries no header (an ingest bug:
    raw stream dumped without its container) and every ``JPEG_MOD``-th is a
    JPEG regardless of the declared kind (mislabelled asset)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        body = hashlib.sha256(f"media{i}".encode()).digest() * 8
        if i % NO_MAGIC_MOD == 0:
            head = b""
        elif i % JPEG_MOD == 0:
            head = bytes.fromhex(JPEG_HEX)
        else:
            head = bytes.fromhex(MAGIC_HEX[kind])
        rows.append(
            (i, kind, f"application/x-fake-{kind}", 32 + i % 64, 24 + i % 48,
             1000 + 100 * i, bytearray(head + body)),
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sniff_mime(media: DataFrame) -> DataFrame:
    """Magic-byte MIME detection over the opaque binary payload — the
    ingest-side trust audit that catches mislabelled or headerless assets
    BEFORE they reach a decoder.  Pure built-ins: one ``hex(substring())``
    prefix per row inside whole-stage codegen, no UDF, no shuffle (the
    classifier is a map-only CASE).  Real signatures: PNG, JPEG/JFIF,
    RIFF-WAVE (bytes 1-4 + 9-12), mp4 ftyp (bytes 5-8).
    Output: (media_id, kind, sniffed_mime, kind_matches)."""
    hx = F.hex(F.substring("payload", 1, 12))
    sniffed = (
        F.when(hx.startswith("89504E470D0A1A0A"), F.lit("image/png"))
        .when(hx.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(
            (F.substring(hx, 1, 8) == "52494646")
            & (F.substring(hx, 17, 8) == "57415645"),
            F.lit("audio/wav"),
        )
        .when(F.substring(hx, 9, 8) == "66747970", F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return media.select(
        "media_id",
        "kind",
        sniffed.alias("sniffed_mime"),
        (F.split(sniffed, "/").getItem(0) == F.col("kind")).alias(
            "kind_matches"
        ),
    )


def sniff_mime_sql(n: int = 64) -> str:
    """DuckDB twin: replays the deterministic generator RULE (which magic
    hex each media_id received) and applies the SAME hex-prefix classifier,
    so the engine's sniff of real binary payloads is checked against an
    independent SQL derivation."""
    png = MAGIC_HEX["image"]
    wav = MAGIC_HEX["audio"]
    mp4 = MAGIC_HEX["video"]
    return f"""
    WITH m AS (
      SELECT i AS media_id,
             ['image', 'audio', 'video'][(i % 3) + 1] AS kind,
             CASE WHEN i % {NO_MAGIC_MOD} = 0 THEN ''
                  WHEN i % {JPEG_MOD} = 0 THEN '{JPEG_HEX}'
                  WHEN i % 3 = 0 THEN '{png}'
                  WHEN i % 3 = 1 THEN '{wav}'
                  ELSE '{mp4}' END
               || upper(sha256('media' || i::VARCHAR))
               AS hx_full
      FROM range({n}) t(i)),
    s AS (
      SELECT media_id, kind, substr(hx_full, 1, 24) AS hx FROM m),
    c AS (
      SELECT media_id, kind,
             CASE WHEN hx LIKE '89504E470D0A1A0A%' THEN 'image/png'
                  WHEN hx LIKE 'FFD8FF%' THEN 'image/jpeg'
                  WHEN substr(hx, 1, 8) = '52494646'
                       AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav'
                  WHEN substr(hx, 9, 8) = '66747970' THEN 'video/mp4'
                  ELSE 'application/octet-stream' END AS sniffed_mime
      FROM s)
    SELECT media_id, kind, sniffed_mime,
           string_split(sniffed_mime, '/')[1] = kind AS kind_matches
    FROM c
    """


# ---------------------------------------------------------------------------
# Binary payload dedup (exact, sha256) + aspect-preserving thumbnail resize
# ---------------------------------------------------------------------------

DUP_GROUP = 2  # synth_media_dups: every DUP_GROUP consecutive ids share bytes


def synth_media_dups(spark, n: int = 64) -> DataFrame:
    """:func:`synth_media` variant with EXACT byte duplicates: ids
    ``DUP_GROUP*j .. DUP_GROUP*j+DUP_GROUP-1`` carry identical payloads but
    different media_id / declared mime — the 'same asset uploaded twice
    under different metadata' ingest fault payload dedup must catch."""
    rows = []
    for i in range(n):
        j = i // DUP_GROUP
        kind = ["image", "audio", "video"][j % 3]
        payload = hashlib.sha256(f"asset{j}".encode()).digest() * 8
        rows.append(
            (i, kind, f"application/x-upload-{i}", 32 + i % 64, 24 + i % 48,
             1000 + 100 * i, bytearray(payload)),
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def payload_dedup(media: DataFrame) -> DataFrame:
    """Exact binary dedup over the opaque payload: group by the sha256 of
    the payload's hex form (JVM-side ``sha2(hex(payload))`` — built-in,
    codegen, no UDF) and report copy counts per distinct byte string.

    ONE map-side-combined aggregate keyed by the 64-char digest — uniform
    by construction (a cryptographic hash key cannot skew), exchange
    carries one row per distinct asset per map partition.  Output:
    (payload_sha, n_copies, first_media_id, n_kinds).
    """
    return (
        media.select(
            F.sha2(F.hex("payload"), 256).alias("payload_sha"),
            "media_id",
            "kind",
        )
        .groupBy("payload_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("first_media_id"),
            F.countDistinct("kind").cast("long").alias("n_kinds"),
        )
    )


def payload_dedup_sql(n: int = 64) -> str:
    """DuckDB twin: replays the :func:`synth_media_dups` byte rule (payload
    hex = 8x the uppercase sha256 of ``asset{id//DUP_GROUP}``) and applies
    the SAME sha256-of-hex grouping."""
    return f"""
    WITH m AS (
      SELECT i AS media_id,
             ['image', 'audio', 'video'][((i // {DUP_GROUP}) % 3) + 1] AS kind,
             repeat(upper(sha256('asset' || (i // {DUP_GROUP})::VARCHAR)), 8)
               AS hx
      FROM range({n}) t(i))
    SELECT sha256(hx) AS payload_sha,
           COUNT(*)::BIGINT AS n_copies,
           MIN(media_id) AS first_media_id,
           COUNT(DISTINCT kind)::BIGINT AS n_kinds
    FROM m GROUP BY 1
    """


THUMB_MAX_DIM = 16  # thumbnail bounding box (square)


def _thumb_dims(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving integer target dims: longest side -> max_dim."""
    m = max(width, height)
    return max(1, (width * max_dim) // m), max(1, (height * max_dim) // m)


def resize_thumbnails(media: DataFrame, max_dim: int = THUMB_MAX_DIM) -> DataFrame:
    """Image thumbnail stage: aspect-preserving integer resize of every
    image payload to a ``max_dim``-bounded box, via an Arrow-batched
    ``mapInPandas`` over the binary column — the real 100-TB plumbing
    (binary in, typed struct out, whole partitions per Arrow batch, decoder
    constructed once per batch iterator).

    STUB RESAMPLER — the container has no image codecs, so the pixel
    resample is a deterministic fake (thumb bytes = sha256 of
    ``thumb:{media_id}:{tw}x{th}``); a Pillow/libjpeg decode-resize drops
    into ``_resample`` unchanged.  The target-dims arithmetic is REAL and
    integer-exact: ``(side * max_dim) // max(width, height)``, floored at 1.
    Output: (media_id, width, height, thumb_w, thumb_h, thumb_sha).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("thumb_w", IntegerType()),
            StructField("thumb_h", IntegerType()),
            StructField("thumb_sha", StringType()),
        ]
    )

    def _resample(media_id: int, tw: int, th: int, payload: bytes) -> str:
        # STUB: stands in for decode(payload) -> resize(tw, th) -> encode
        return hashlib.sha256(f"thumb:{media_id}:{tw}x{th}".encode()).hexdigest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                tw, th = _thumb_dims(int(r.width), int(r.height), max_dim)
                rows.append(
                    (int(r.media_id), int(r.width), int(r.height), tw, th,
                     _resample(int(r.media_id), tw, th, bytes(r.payload))),
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in out_schema.fields],
            )

    return media.where(F.col("kind") == "image").mapInPandas(run, out_schema)


def resize_thumbnails_sql(n: int = 64, max_dim: int = THUMB_MAX_DIM) -> str:
    """DuckDB twin: replays the :func:`synth_media` metadata rule (width =
    32 + i%64, height = 24 + i%48, image kind at i%3 = 0) and the exact
    integer dims + stub-resample sha."""
    return f"""
    WITH m AS (
      SELECT i AS media_id,
             (32 + i % 64)::INT AS width,
             (24 + i % 48)::INT AS height
      FROM range({n}) t(i) WHERE i % 3 = 0),
    d AS (
      SELECT media_id, width, height,
             GREATEST(1, (width * {max_dim})
                         // GREATEST(width, height))::INT AS thumb_w,
             GREATEST(1, (height * {max_dim})
                         // GREATEST(width, height))::INT AS thumb_h
      FROM m)
    SELECT media_id, width, height, thumb_w, thumb_h,
           sha256('thumb:' || media_id::VARCHAR || ':'
                  || thumb_w::VARCHAR || 'x' || thumb_h::VARCHAR) AS thumb_sha
    FROM d
    """


# ---------------------------------------------------------------------------
# Audio window framing (the ASR/audio-LM front end of a multimodal pipeline)
# ---------------------------------------------------------------------------

SAMPLES_PER_MS = 8       # stub decode rate: 8 one-byte samples per ms (8 kHz)
WINDOW_MS = 400          # analysis window length
HOP_MS = 200             # 50% overlap hop


def _decode_pcm(payload: bytes, duration_ms: int) -> np.ndarray:
    """STUB PCM DECODER — deterministic fake samples derived from the
    payload, same md5-byte-stream discipline as :func:`_decode_rgb` (with a
    ``|pcm|`` domain separator so audio and image streams never collide):
    sample j is byte ``j % 16`` of ``md5(hex(payload) + '|pcm|' + j // 16)``.
    The DuckDB oracle twin replays it with substr arithmetic.  A real
    ffmpeg/soundfile decode drops in unchanged; the Spark plumbing (Arrow
    batches, UDTF-shaped explode, schema) is identical either way."""
    hexp = payload.hex()
    n = duration_ms * SAMPLES_PER_MS
    out = np.empty(n, dtype=np.uint8)
    for blk in range((n + 15) // 16):
        digest = hashlib.md5(f"{hexp}|pcm|{blk}".encode()).digest()
        lo = blk * 16
        chunk = min(16, n - lo)
        out[lo : lo + chunk] = np.frombuffer(digest[:chunk], dtype=np.uint8)
    return out


_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("start_ms", IntegerType()),
        StructField("mean_amp", DoubleType()),
        StructField("peak_amp", IntegerType()),
    ]
)


def audio_windows(
    media: DataFrame, window_ms: int = WINDOW_MS, hop_ms: int = HOP_MS
) -> DataFrame:
    """Audio analysis-window framing over opaque binary audio columns: each
    clip decodes (stub) to a fixed-rate sample stream and explodes into
    overlapping ``window_ms``/``hop_ms`` frames — the framing every audio
    feature extractor (fbank, wav2vec chunking) runs first.

    Every emitted value is exact: ``mean_amp`` is an exact integer sample
    sum over an exact count (bit-identical float64 across engines and
    summation orders — the mm_features discipline) and ``peak_amp`` is an
    integer max.  Window sums are computed from ONE cumulative sum per clip
    (O(samples), not O(windows x window)).  Arrow-batched ``mapInPandas``;
    per-clip work is independent so the operator scales with the number of
    clips, not their total duration skew (a pathological long clip is one
    task, bounded by the duration cap upstream ingest enforces).
    """
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)
    wlen = window_ms * SAMPLES_PER_MS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "win_idx": [], "start_ms": [],
                "mean_amp": [], "peak_amp": [],
            }
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                dur = int(dur)
                pcm = _decode_pcm(bytes(payload), dur)
                cs = np.concatenate(
                    [[0], np.cumsum(pcm, dtype=np.int64)]
                )
                for i, start in enumerate(range(0, dur - window_ms + 1, hop_ms)):
                    lo = start * SAMPLES_PER_MS
                    seg_sum = int(cs[lo + wlen] - cs[lo])
                    rows["media_id"].append(int(mid))
                    rows["win_idx"].append(i)
                    rows["start_ms"].append(start)
                    rows["mean_amp"].append(seg_sum / wlen)
                    rows["peak_amp"].append(int(pcm[lo : lo + wlen].max()))
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(run, _WINDOW_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image near-dup: average-hash over the pooled band features
# ---------------------------------------------------------------------------

AHASH_BITS = 16          # one bit per pooled band feature (8 col + 8 row)
AHASH_BANDS = 4          # LSH bands over the hash (4 bits each)
AHASH_MAX_HAMMING = 3    # <= bands - 1 keeps band blocking LOSSLESS


def image_ahash_pairs(
    media: DataFrame, max_hamming: int = AHASH_MAX_HAMMING
) -> DataFrame:
    """Perceptual near-duplicate image pairs via average-hash (aHash): decode
    (stub) -> 16 pooled band means (:func:`extract_features`) -> one bit per
    band (``band_mean > mean_luma``) packed JVM-side into a 16-bit hash ->
    banded Hamming blocking -> exact ``bit_count(xor)`` verify.

    Scale shape (the whole point at 100 TB): candidate generation is a
    4-bit-band equi-join — NEVER all-pairs.  With ``max_hamming <=
    AHASH_BANDS - 1`` the blocking is lossless by pigeonhole (a pair within
    Hamming 3 differs in at most 3 of the 4 bands, so at least one band
    matches exactly), which the all-pairs DuckDB oracle verifies.  The bit
    packing itself is a built-in higher-order function (``transform`` +
    ``aggregate``) inside whole-stage codegen — the only Python is the
    Arrow-batched stub decode.  Real-image parity: swap ``_decode_rgb`` for
    libjpeg and the same plan computes classic aHash (mean-threshold bits
    over pooled luma), per Krawetz's average-hash construction.

    Output: (media_id_a, media_id_b, hamming) for pairs within
    ``max_hamming``.
    """
    assert max_hamming <= AHASH_BANDS - 1, "blocking only lossless there"
    feats = extract_features(media).where(F.col("kind") == "image")
    hashed = feats.select(
        "media_id",
        F.expr(
            "aggregate(transform(feat, (v, i) -> IF(v > mean_luma,"
            " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("ahash"),
    )
    bands = hashed.select(
        "media_id",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("ahash", 4 * b).bitwiseAND(F.lit(15))
                    for b in range(AHASH_BANDS)
                ]
            )
        ).alias("band", "bval"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.col("a.ahash").alias("h_a"),
            F.col("b.ahash").alias("h_b"),
        )
        # a pair sharing k bands appears k times — one verify per pair
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("media_id_a", "media_id_b", "hamming")
    )


def image_ahash_pairs_sql(
    n: int = 288, max_hamming: int = AHASH_MAX_HAMMING
) -> str:
    """DuckDB twin: replays the md5 pixel stream (the :func:`mm_features`
    oracle discipline), derives the same 16 threshold bits, and checks ALL
    image pairs by per-dim bit disagreement — so a blocking bug that LOSES a
    within-Hamming pair fails the hash check, not just a verify bug."""
    max_px = (24 + 47) * (32 + 63) * 3 + 16
    return f"""
    WITH m AS (
      SELECT i AS media_id, 32 + i % 64 AS w, 24 + i % 48 AS h,
             repeat(sha256('media' || i::VARCHAR), 8) AS hexp
      FROM range({n}) t(i) WHERE i % 3 = 0),
    px AS (
      SELECT media_id, w, h, j.range AS j,
             ('0x' || substr(md5(hexp || '|' || (j.range // 16)::VARCHAR),
                             (j.range % 16)::INT * 2 + 1, 2))::INT AS v
      FROM m CROSS JOIN range({max_px}) j
      WHERE j.range < h * w * 3),
    coords AS (
      SELECT media_id, w, h, v,
             j // (w * 3) AS y, (j % (w * 3)) // 3 AS x
      FROM px),
    bx AS (
      SELECT media_id, r.range AS bj,
             (r.range * w) // 8 AS x0, ((r.range + 1) * w) // 8 AS x1
      FROM m CROSS JOIN range(8) r),
    by_ AS (
      SELECT media_id, r.range AS bi,
             (r.range * h) // 8 AS y0, ((r.range + 1) * h) // 8 AS y1
      FROM m CROSS JOIN range(8) r),
    colm AS (
      SELECT c.media_id, x.bj AS dim, SUM(c.v) / COUNT(*)::DOUBLE AS fv
      FROM coords c
      JOIN bx x ON x.media_id = c.media_id AND c.x >= x.x0 AND c.x < x.x1
      GROUP BY 1, 2),
    rowm AS (
      SELECT c.media_id, 8 + y.bi AS dim, SUM(c.v) / COUNT(*)::DOUBLE AS fv
      FROM coords c
      JOIN by_ y ON y.media_id = c.media_id AND c.y >= y.y0 AND c.y < y.y1
      GROUP BY 1, 2),
    luma AS (
      SELECT media_id, SUM(v) / COUNT(*)::DOUBLE AS mean_luma
      FROM coords GROUP BY 1),
    bits AS (
      SELECT f.media_id, f.dim,
             CASE WHEN f.fv > l.mean_luma THEN 1 ELSE 0 END AS bit
      FROM (SELECT * FROM colm UNION ALL SELECT * FROM rowm) f
      JOIN luma l USING (media_id))
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)::INT AS hamming
    FROM bits a JOIN bits b
      ON a.dim = b.dim AND a.media_id < b.media_id
    GROUP BY 1, 2
    HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= {max_hamming}
    """


def audio_windows_sql(
    n: int = 48, window_ms: int = WINDOW_MS, hop_ms: int = HOP_MS
) -> str:
    """DuckDB twin: replays the :func:`synth_media` audio rows (kind at
    i%3 = 1, duration 1000+100i) and the ``|pcm|`` md5 byte stream with
    substr arithmetic, then aggregates the SAME sample spans."""
    spm = SAMPLES_PER_MS
    max_dur = 1000 + 100 * (n - 1)
    return f"""
    WITH m AS (
      SELECT i AS media_id, 1000 + 100 * i AS dur,
             repeat(sha256('media' || i::VARCHAR), 8) AS hexp
      FROM range({n}) t(i) WHERE i % 3 = 1),
    px AS (
      SELECT media_id, dur, j.range AS j,
             ('0x' || substr(md5(hexp || '|pcm|' || (j.range // 16)::VARCHAR),
                             (j.range % 16)::INT * 2 + 1, 2))::INT AS v
      FROM m CROSS JOIN range({max_dur * spm}) j
      WHERE j.range < dur * {spm}),
    w AS (
      SELECT media_id, dur, wi.range AS win_idx,
             wi.range * {hop_ms} AS start_ms
      FROM m CROSS JOIN range({(max_dur - window_ms) // hop_ms + 1}) wi
      WHERE wi.range * {hop_ms} + {window_ms} <= dur)
    SELECT w.media_id, w.win_idx::INT AS win_idx, w.start_ms::INT AS start_ms,
           SUM(p.v) / COUNT(*)::DOUBLE AS mean_amp,
           MAX(p.v)::INT AS peak_amp
    FROM w JOIN px p
      ON p.media_id = w.media_id
     AND p.j >= w.start_ms * {spm}
     AND p.j < (w.start_ms + {window_ms}) * {spm}
    GROUP BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# Video scene-cut detection (frame-difference thresholding)
# ---------------------------------------------------------------------------

FRAME_LUMA_BYTES = 64     # stub frame decode: 64 luma samples per frame
SCENE_CUT_DELTA = 12.0    # |mean-luma step| that counts as a hard cut
FRAME_EVERY_MS = 500


def frame_lumas(media: DataFrame, every_ms: int = FRAME_EVERY_MS) -> DataFrame:
    """Per-sampled-frame mean luma for every video payload.  STUB FRAME
    DECODER — same md5-byte-stream discipline as :func:`_decode_rgb` with
    a ``|frame|ts|`` domain separator; a real ffmpeg keyframe decode
    drops in unchanged.  Mean luma is an exact integer sum over
    ``FRAME_LUMA_BYTES`` = 2^6 samples, so the double is bit-exact across
    engines.  Arrow-batched; output (media_id, frame_idx, ts_ms, luma)."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("ts_ms", IntegerType()),
            StructField("luma", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "luma": []}
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                hexp = bytes(payload).hex()
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    total = 0
                    for blk in range(FRAME_LUMA_BYTES // 16):
                        dg = hashlib.md5(
                            f"{hexp}|frame|{ts}|{blk}".encode()
                        ).digest()
                        total += sum(dg)
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["luma"].append(total / FRAME_LUMA_BYTES)
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(run, schema)


def scene_cuts(media: DataFrame, every_ms: int = FRAME_EVERY_MS,
               delta: float = SCENE_CUT_DELTA) -> DataFrame:
    """Hard scene-cut detection: a cut wherever consecutive sampled
    frames' mean luma steps by more than ``delta`` — the classic
    frame-difference shot-boundary detector, composed Spark-first: the
    Arrow UDF only decodes (per-frame luma), the temporal reasoning is a
    video-keyed ``lag`` window (key-local exchange — a pathological
    10-hour video is one key, bounded by upstream duration caps).
    Exact arithmetic end to end (2^6-sample means; IEEE-exact
    differences).  Output: (media_id, frame_idx, ts_ms, luma, prev_luma,
    step)."""
    from pyspark.sql.window import Window

    lumas = frame_lumas(media, every_ms)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    stepped = lumas.withColumn("prev_luma", F.lag("luma").over(w))
    return (
        stepped.where(
            F.col("prev_luma").isNotNull()
            & (F.abs(F.col("luma") - F.col("prev_luma")) > delta)
        )
        .select(
            "media_id", "frame_idx", "ts_ms", "luma", "prev_luma",
            (F.col("luma") - F.col("prev_luma")).alias("step"),
        )
    )


def scene_cuts_sql(n: int = 48, every_ms: int = FRAME_EVERY_MS,
                   delta: float = SCENE_CUT_DELTA) -> str:
    """DuckDB twin: replays the synth-media video rows, the
    ``|frame|ts|blk`` md5 luma stream with substr arithmetic, and the
    same lag-window cut rule."""
    max_dur = 1000 + 100 * (n - 1)
    n_frames = (max_dur - 1) // every_ms + 1
    blks = FRAME_LUMA_BYTES // 16
    return f"""
    WITH m AS (
      SELECT i AS media_id, 1000 + 100 * i AS dur,
             repeat(sha256('media' || i::VARCHAR), 8) AS hexp
      FROM range({n}) t(i) WHERE i % 3 = 2),
    fr AS (
      SELECT media_id, dur, f.range AS frame_idx,
             (f.range * {every_ms})::INT AS ts_ms, hexp
      FROM m CROSS JOIN range({n_frames}) f
      WHERE f.range * {every_ms} < dur),
    by_ AS (
      SELECT fr.media_id, fr.frame_idx, fr.ts_ms,
             SUM(('0x' || substr(
                md5(fr.hexp || '|frame|' || fr.ts_ms::VARCHAR || '|'
                    || b.range::VARCHAR),
                (j.range)::INT * 2 + 1, 2))::INT) AS total
      FROM fr CROSS JOIN range({blks}) b CROSS JOIN range(16) j
      GROUP BY 1, 2, 3),
    lum AS (
      SELECT media_id, frame_idx::INT AS frame_idx, ts_ms,
             total / {FRAME_LUMA_BYTES}.0 AS luma
      FROM by_),
    st AS (
      SELECT media_id, frame_idx, ts_ms, luma,
             lag(luma) OVER (PARTITION BY media_id ORDER BY frame_idx)
               AS prev_luma
      FROM lum)
    SELECT media_id, frame_idx, ts_ms, luma, prev_luma,
           luma - prev_luma AS step
    FROM st
    WHERE prev_luma IS NOT NULL AND ABS(luma - prev_luma) > {delta}
    """


# ---------------------------------------------------------------------------
# Audio fingerprint matching (landmark hashing, Shazam-style)
# ---------------------------------------------------------------------------

FP_WIN_MS = 100          # landmark window (non-overlapping)
FP_LANDMARK_SPAN = 3     # consecutive window peaks hashed per landmark
FP_MIN_MATCHES = 3       # offset-consistent landmarks to call a match
FP_DF_CAP = 16           # hot-fingerprint document-frequency cap
_TAG_MARKER = b"TAG:"


def synth_media_streams(spark, n: int = 40) -> DataFrame:
    """Deterministic audio table where clips 2k and 2k+1 carry the SAME
    encoded stream under DIFFERENT trailing metadata tags and different
    durations — the re-encode/re-tag case that byte-hash dedup
    (payload_dedup) structurally misses and fingerprint matching exists
    to catch."""
    rows = []
    for i in range(n):
        stream = hashlib.sha256(f"stream{i // 2}".encode()).digest() * 8
        payload = stream + _TAG_MARKER + f"tag{i}".encode()
        rows.append(
            (i, "audio", "application/x-fake-audio", 0, 0,
             900 + 150 * (i % 4), bytearray(payload)),
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stream_pcm(payload: bytes, duration_ms: int) -> np.ndarray:
    """STUB CODEC — like :func:`_decode_pcm` but container-aware the way a
    real codec is: trailing metadata after the last ``TAG:`` marker is NOT
    part of the encoded stream and never reaches the sample stream (domain
    separator ``|fp|``).  Two payloads that differ only in their tag
    decode to identical PCM."""
    idx = payload.rfind(_TAG_MARKER)
    stream = payload[:idx] if idx >= 0 else payload
    hexp = stream.hex()
    n = duration_ms * SAMPLES_PER_MS
    out = np.empty(n, dtype=np.uint8)
    for blk in range((n + 15) // 16):
        digest = hashlib.md5(f"{hexp}|fp|{blk}".encode()).digest()
        lo = blk * 16
        chunk = min(16, n - lo)
        out[lo : lo + chunk] = np.frombuffer(digest[:chunk], dtype=np.uint8)
    return out


_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("fp", LongType()),
    ]
)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Per-clip landmark fingerprints: the stream decodes (stub) to PCM,
    each non-overlapping ``FP_WIN_MS`` window contributes its exact
    integer energy (byte sum — discriminative where a byte MAX saturates),
    and each landmark hashes ``FP_LANDMARK_SPAN`` consecutive energies
    (md5-60) at its window position.  Landmarks are position-stamped so
    the matcher can demand OFFSET-CONSISTENT agreement, the property that
    separates shared content from coincidental peak collisions.
    Arrow-batched ``mapInPandas``; per-clip cost is linear in duration."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)
    wlen = FP_WIN_MS * SAMPLES_PER_MS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "win_idx": [], "fp": []}
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"],
                pdf["payload"],
            ):
                if kind != "audio":
                    continue
                pcm = _decode_stream_pcm(bytes(payload), int(dur))
                n_win = len(pcm) // wlen
                peaks = (pcm[: n_win * wlen].reshape(n_win, wlen)
                         .sum(axis=1, dtype=np.int64))
                for w in range(n_win - FP_LANDMARK_SPAN + 1):
                    key = ":".join(
                        str(int(p)) for p in peaks[w : w + FP_LANDMARK_SPAN]
                    )
                    rows["media_id"].append(int(mid))
                    rows["win_idx"].append(w)
                    rows["fp"].append(
                        int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(run, _FP_SCHEMA)


def audio_match_pairs(media: DataFrame) -> DataFrame:
    """(media_a, media_b, delta_win, n_matches) clip pairs sharing >=
    ``FP_MIN_MATCHES`` landmarks at ONE consistent window offset.

    Scale shape: candidate generation is an equi-join on the fingerprint
    value (the inverted-index lookup every audio-search system runs), so
    cost is bounded by fingerprint collisions, never all-pairs; hot
    fingerprints (df > ``FP_DF_CAP``: silence, test tones, boilerplate
    jingles) are dropped before the join — the textops hot-shingle cap
    applied to audio."""
    from ..cache import tracked_persist

    fps = tracked_persist(audio_fingerprints(media))
    hot = (
        fps.groupBy("fp")
        .agg(F.countDistinct("media_id").alias("df"))
        .where(F.col("df") > FP_DF_CAP)
        .select("fp")
    )
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = cold.select(
        F.col("fp"), F.col("media_id").alias("media_a"),
        F.col("win_idx").alias("_wa"),
    )
    b = cold.select(
        F.col("fp"), F.col("media_id").alias("media_b"),
        F.col("win_idx").alias("_wb"),
    )
    return (
        a.join(b, "fp")
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy(
            "media_a", "media_b",
            (F.col("_wa") - F.col("_wb")).alias("delta_win"),
        )
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .where(F.col("n_matches") >= FP_MIN_MATCHES)
    )


def audio_match_pairs_sql(n: int = 40) -> str:
    """DuckDB twin: replays :func:`synth_media_streams` (stream hex =
    ``repeat(sha256('stream' || i//2), 8)`` — the tag never enters the
    stream, exactly like the codec), the ``|fp|`` md5 sample stream, the
    window peaks, the landmark hashes, the df cap, and the
    offset-grouped join."""
    spm = SAMPLES_PER_MS
    wlen = FP_WIN_MS * spm
    max_dur = 900 + 150 * 3
    return f"""
    WITH m AS (
      SELECT i AS media_id, 900 + 150 * (i % 4) AS dur,
             repeat(sha256('stream' || (i // 2)::VARCHAR), 8) AS hexp
      FROM range({n}) t(i)),
    px AS (
      SELECT media_id, dur, j.range AS j,
             ('0x' || substr(md5(hexp || '|fp|' || (j.range // 16)::VARCHAR),
                             (j.range % 16)::INT * 2 + 1, 2))::INT AS v
      FROM m CROSS JOIN range({max_dur * spm}) j
      WHERE j.range < (dur * {spm} // {wlen}) * {wlen}),
    peaks AS (
      SELECT media_id, j // {wlen} AS w, SUM(v)::BIGINT AS peak
      FROM px GROUP BY 1, 2),
    fps AS (
      SELECT p0.media_id, p0.w::INT AS win_idx,
             ('0x' || substr(md5(p0.peak::VARCHAR || ':' ||
                                 p1.peak::VARCHAR || ':' ||
                                 p2.peak::VARCHAR), 1, 15))::BIGINT AS fp
      FROM peaks p0
      JOIN peaks p1 ON p1.media_id = p0.media_id AND p1.w = p0.w + 1
      JOIN peaks p2 ON p2.media_id = p0.media_id AND p2.w = p0.w + 2),
    cold AS (
      SELECT * FROM fps WHERE fp NOT IN (
        SELECT fp FROM fps GROUP BY fp
        HAVING COUNT(DISTINCT media_id) > {FP_DF_CAP})),
    pairs AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             (a.win_idx - b.win_idx)::INT AS delta_win,
             COUNT(*)::BIGINT AS n_matches
      FROM cold a JOIN cold b
        ON a.fp = b.fp AND a.media_id < b.media_id
      GROUP BY 1, 2, 3)
    SELECT media_a, media_b, delta_win, n_matches
    FROM pairs WHERE n_matches >= {FP_MIN_MATCHES}
    """
