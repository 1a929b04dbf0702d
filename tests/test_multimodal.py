"""Multimodal plumbing: schema/batch shape of the decode -> feature and
frame-sampling UDFs (the decoder itself is a documented deterministic stub)."""

from __future__ import annotations

import pytest

from ehr_ner_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synth_media,
)


def test_feature_extraction_shape(spark):
    media = synth_media(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feat) == 16
        assert 0.0 <= r.mean_luma <= 255.0


def test_feature_determinism(spark):
    media = synth_media(spark, 12)
    a = sorted((r.media_id, tuple(r.feat)) for r in extract_features(media).collect())
    b = sorted(
        (r.media_id, tuple(r.feat))
        for r in extract_features(media.repartition(5)).collect()
    )
    assert a == b


def test_frame_sampling(spark):
    media = synth_media(spark, 30)
    frames = sample_frames(media, every_ms=500).collect()
    videos = {r.media_id: r.duration_ms for r in media.collect() if r.kind == "video"}
    assert {r.media_id for r in frames} == set(videos)
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        assert len(rows) == len(range(0, videos[mid], 500))
        assert sorted(r.frame_idx for r in rows) == list(range(len(rows)))
        assert len({r.frame_sha for r in rows}) == len(rows)


def test_extract_features_tiny_media(spark):
    """Media smaller than the pool grid (w or h < 8) must not divide by
    zero: empty bands contribute 0.0 (regression test)."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    tiny = spark.createDataFrame(
        [Row(media_id=0, kind="image", mime="x", width=4, height=3,
             duration_ms=0, payload=bytearray(b"\x01\x02" * 16))],
        MEDIA_SCHEMA,
    )
    rows = extract_features(tiny).collect()
    assert len(rows) == 1 and len(rows[0].feat) == 16


def test_payload_dedup_groups_identical_bytes(spark):
    from ehr_ner_spark.operators.multimodal import (
        DUP_GROUP,
        payload_dedup,
        synth_media_dups,
    )

    n = 48
    rows = payload_dedup(synth_media_dups(spark, n)).collect()
    assert len(rows) == n // DUP_GROUP
    for r in rows:
        assert r["n_copies"] == DUP_GROUP
        assert r["first_media_id"] % DUP_GROUP == 0
        assert r["n_kinds"] == 1  # copies share the asset's kind
        assert len(r["payload_sha"]) == 64


def test_thumbnails_aspect_and_stub_sha(spark):
    import hashlib

    from ehr_ner_spark.operators.multimodal import (
        THUMB_MAX_DIM,
        _thumb_dims,
        resize_thumbnails,
        synth_media,
    )

    rows = resize_thumbnails(synth_media(spark, 30)).collect()
    assert rows and all(
        max(r["thumb_w"], r["thumb_h"]) <= THUMB_MAX_DIM for r in rows
    )
    for r in rows:
        tw, th = _thumb_dims(r["width"], r["height"], THUMB_MAX_DIM)
        assert (r["thumb_w"], r["thumb_h"]) == (tw, th)
        # longest side hits the box exactly (integer floor on the other)
        assert max(tw, th) == THUMB_MAX_DIM
        want = hashlib.sha256(
            f"thumb:{r['media_id']}:{tw}x{th}".encode()
        ).hexdigest()
        assert r["thumb_sha"] == want


def test_thumb_dims_never_zero():
    from ehr_ner_spark.operators.multimodal import _thumb_dims

    assert _thumb_dims(1000, 1, 16) == (16, 1)
    assert _thumb_dims(1, 1000, 16) == (1, 16)
    assert _thumb_dims(5, 5, 16) == (16, 16)


def test_audio_windows_framing(spark):
    import numpy as np

    from ehr_ner_spark.operators.multimodal import (
        HOP_MS,
        SAMPLES_PER_MS,
        WINDOW_MS,
        _decode_pcm,
        audio_windows,
        synth_media,
    )

    media = synth_media(spark, 12)
    rows = audio_windows(media).collect()
    assert rows
    # only audio clips produce frames; window count matches the formula
    clips = {
        r["media_id"]: 1000 + 100 * r["media_id"]
        for r in media.collect()
        if r["kind"] == "audio"
    }
    by_clip = {}
    for r in rows:
        assert r["media_id"] in clips
        by_clip.setdefault(r["media_id"], []).append(r)
    for mid, dur in clips.items():
        want_n = (dur - WINDOW_MS) // HOP_MS + 1
        got = sorted(by_clip[mid], key=lambda r: r["win_idx"])
        assert len(got) == want_n
        assert [r["start_ms"] for r in got] == [
            i * HOP_MS for i in range(want_n)
        ]
    # mean/peak re-derived sample-exactly from the stub PCM stream
    import hashlib

    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.collect()
        if r["kind"] == "audio"
    }
    for mid, dur in clips.items():
        pcm = _decode_pcm(payloads[mid], dur)
        for r in by_clip[mid]:
            lo = r["start_ms"] * SAMPLES_PER_MS
            seg = pcm[lo : lo + WINDOW_MS * SAMPLES_PER_MS]
            assert r["peak_amp"] == int(seg.max())
            assert r["mean_amp"] == int(seg.sum(dtype=np.int64)) / seg.size


def test_audio_windows_short_clip_yields_none(spark):
    from ehr_ner_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_windows,
    )

    short = spark.createDataFrame(
        [(0, "audio", "application/x-fake-audio", 8, 8, 399,
          bytearray(b"\x01" * 32))],
        MEDIA_SCHEMA,
    )
    assert audio_windows(short).count() == 0


def test_image_ahash_blocking_is_lossless(spark):
    """Band blocking must find EXACTLY the pairs brute-force all-pairs
    Hamming finds at the <= 3 threshold (pigeonhole: 4 bands, <= 3
    differing bits leaves one band equal)."""
    from ehr_ner_spark.operators.multimodal import (
        extract_features,
        image_ahash_pairs,
        synth_media,
    )

    media = synth_media(spark, 288)
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in image_ahash_pairs(media).collect()
    }

    feats = (
        extract_features(media)
        .where("kind = 'image'")
        .select("media_id", "mean_luma", "feat")
        .collect()
    )
    hashes = {
        r.media_id: sum(
            1 << i for i, v in enumerate(r.feat) if v > r.mean_luma
        )
        for r in feats
    }
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want and len(want) > 0


def test_image_ahash_hash_packing_matches_numpy(spark):
    """The JVM-side transform/aggregate bit packing equals the NumPy
    threshold-pack for every image."""
    import pyspark.sql.functions as F

    from ehr_ner_spark.operators.multimodal import (
        extract_features,
        synth_media,
    )

    feats = extract_features(synth_media(spark, 48)).where("kind = 'image'")
    packed = feats.select(
        "media_id",
        "mean_luma",
        "feat",
        F.expr(
            "aggregate(transform(feat, (v, i) -> IF(v > mean_luma,"
            " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("ahash"),
    ).collect()
    for r in packed:
        assert r.ahash == sum(
            1 << i for i, v in enumerate(r.feat) if v > r.mean_luma
        )


def test_scene_cuts_match_sequential_rederivation(spark):
    """Cuts equal a sequential NumPy re-derivation of the same md5 luma
    stream and threshold; every reported step exceeds the threshold."""
    import hashlib

    from ehr_ner_spark.operators.multimodal import (
        FRAME_LUMA_BYTES,
        SCENE_CUT_DELTA,
        scene_cuts,
        synth_media,
    )

    got = {
        (r.media_id, r.frame_idx): (r.luma, r.prev_luma, r.step)
        for r in scene_cuts(synth_media(spark, 48)).collect()
    }

    def luma(hexp, ts):
        total = 0
        for blk in range(FRAME_LUMA_BYTES // 16):
            dg = hashlib.md5(f"{hexp}|frame|{ts}|{blk}".encode()).digest()
            total += sum(dg)
        return total / FRAME_LUMA_BYTES

    want = {}
    for i in range(48):
        if i % 3 != 2:
            continue
        hexp = (hashlib.sha256(f"media{i}".encode()).digest() * 8).hex()
        dur = 1000 + 100 * i
        lumas = [luma(hexp, ts) for ts in range(0, dur, 500)]
        for f in range(1, len(lumas)):
            step = lumas[f] - lumas[f - 1]
            if abs(step) > SCENE_CUT_DELTA:
                want[(i, f)] = (lumas[f], lumas[f - 1], step)
    assert got == want and len(want) > 0


def test_audio_match_finds_retagged_streams_payload_dedup_misses(spark):
    """Every planted (2k, 2k+1) shared-stream pair must match at offset 0
    with the full landmark overlap of the shorter clip — while their
    payload bytes differ (different TAG suffix), so exact payload-hash
    dedup cannot pair them."""
    import hashlib

    from ehr_ner_spark.operators.multimodal import (
        FP_LANDMARK_SPAN,
        FP_WIN_MS,
        audio_match_pairs,
        synth_media_streams,
    )

    media = synth_media_streams(spark, 40)
    out = {(r["media_a"], r["media_b"]): r
           for r in audio_match_pairs(media).collect()}
    assert set(out) == {(2 * k, 2 * k + 1) for k in range(20)}
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in media.select("media_id", "payload").collect()}
    for (a, b), r in out.items():
        assert r["delta_win"] == 0
        # payload bytes differ -> sha256 dedup is blind to this pair
        assert hashlib.sha256(payloads[a]).digest() != \
            hashlib.sha256(payloads[b]).digest()
        dur_a = 900 + 150 * (a % 4)
        dur_b = 900 + 150 * (b % 4)
        short_wins = min(dur_a, dur_b) // FP_WIN_MS
        assert r["n_matches"] == short_wins - (FP_LANDMARK_SPAN - 1)


def test_audio_fingerprints_truncate_to_whole_windows(spark):
    from ehr_ner_spark.operators.multimodal import (
        FP_LANDMARK_SPAN,
        FP_WIN_MS,
        audio_fingerprints,
        synth_media_streams,
    )

    from pyspark.sql import functions as F

    fps = audio_fingerprints(synth_media_streams(spark, 8))
    counts = {r["media_id"]: r["c"] for r in
              fps.groupBy("media_id").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    for i in range(8):
        wins = (900 + 150 * (i % 4)) // FP_WIN_MS
        assert counts[i] == wins - (FP_LANDMARK_SPAN - 1)
