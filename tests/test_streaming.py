"""Structured Streaming: the batch operators running incrementally
(file source + availableNow trigger), with results equal to the batch run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.streaming.jobs import streaming_event_counts, streaming_mentions


def test_streaming_event_counts_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.write.parquet(src)

    out = streaming_event_counts(spark, src, events.schema)
    q = (
        out.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM evt_counts").collect()
    }
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_mentions_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    docs.write.parquet(src)

    batches = []

    def sink(df, batch_id):
        batches.append(
            {(r.doc_id, r.type, r.start_pos, r.end_pos, r.text) for r in df.collect()}
        )

    q = streaming_mentions(spark, src, docs.schema, sink)
    q.awaitTermination(300)

    got = set().union(*batches) if batches else set()

    from ehr_ner_spark.operators.mention_detect import detect_mentions

    corpus_like = spark.read.parquet(src).select(
        "doc_id",
        F.lit("stream").alias("repo"),
        F.sha2("text", 256).alias("content_sha"),
        F.col("text").alias("content"),
    )
    expected = {
        (r.doc_id, r.type, r.start_pos, r.end_pos, r.text)
        for r in detect_mentions(corpus_like, num_partitions=4).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_dedup_absorbs_duplicate_delivery(spark, sf_dir):
    """Every chunk delivered twice; the watermarked dropDuplicates sink
    must equal SELECT DISTINCT over the table (exactly-once output)."""
    from pyspark.sql import functions as F

    from ehr_ner_spark.streaming.jobs import stream_dedup

    got = stream_dedup(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == ev.count()  # event rows are already distinct
    assert got.select("event_id").distinct().count() == ev.count()
    # spot-check one row's fields against the source
    src = {r["event_id"]: r for r in ev.limit(50).collect()}
    for r in got.where(
        F.col("event_id").isin(*list(src)[:10])
    ).collect():
        s = src[r["event_id"]]
        assert r["user_id"] == s["user_id"]
        assert r["event_type"] == s["event_type"]


def test_watermark_late_audit_drops_stragglers(spark, sf_dir):
    """The late-data audit: stragglers delivered after the watermark passed
    their windows contribute NOTHING — per-window counts equal the batch
    counts over non-straggler rows, restricted to watermark-closed windows
    (the job itself asserts numRowsDroppedByWatermark == the distinct
    straggler-window count, so a silently absorbed late row cannot pass)."""
    from pyspark.sql import functions as F

    from ehr_ner_spark.streaming.jobs import (
        LATE_DELAY_SEC,
        LATE_STRAGGLER_MOD,
        LATE_WINDOW_SEC,
        watermark_late_audit,
    )

    got = {
        (r["window_start_us"], r["window_end_us"]): r["n_events"]
        for r in watermark_late_audit(spark, sf_dir).collect()
    }
    assert got

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    strag_cut = lo + ((hi - lo) * 3) // 5
    wm = (hi // 1000 - LATE_DELAY_SEC * 1000) * 1000
    wlen = LATE_WINDOW_SEC * 1_000_000
    want = {
        (r["w"], r["w"] + wlen): r["n"]
        for r in (
            ev.where(
                ~(
                    (F.col("event_id") % LATE_STRAGGLER_MOD == 0)
                    & (F.col("us") < strag_cut)
                )
            )
            .select((F.col("us") - F.col("us") % wlen).alias("w"))
            .where(F.col("w") + wlen <= wm)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want
    # every emitted window is closed by the final watermark
    assert all(we <= wm for (_, we) in got)


def test_stream_static_enrich_equals_batch_join(spark):
    """The stream-static join's accumulated sink equals the batch
    equi-join, and the run drains in >= 2 micro-batches."""
    from ehr_ner_spark.streaming.jobs import stream_static_enrich

    sf = "/root/testdata/sf0.001"
    got = {
        (r.event_id, r.ts_us): (r.user_id, r.event_type, r.segment)
        for r in stream_static_enrich(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    cu = spark.read.parquet(f"{sf}/customer.parquet")
    import pyspark.sql.functions as F

    want = {
        (r.event_id, r.ts_us): (r.user_id, r.event_type, r.segment)
        for r in ev.join(cu, ev.user_id == cu.c_custkey)
        .select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id", "event_type", F.col("c_mktsegment").alias("segment"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_upsert_idempotent_replay(spark):
    """The final merged table equals last-version-per-key, corrections
    override their base rows, and the duplicated correction batch
    changes nothing (idempotency is structural: 3 batches, 2 identical)."""
    from ehr_ner_spark.streaming.jobs import (
        UPSERT_UPDATE_MOD,
        UPSERT_VALUE_BUMP,
        stream_upsert,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.event_id: (r.ts_us, r.value)
           for r in stream_upsert(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").collect()
    assert len(got) == len(ev)
    for r in ev:
        ts_us = int(r.ts.timestamp() * 1_000_000)
        if r.event_id % UPSERT_UPDATE_MOD == 0:
            assert got[r.event_id] == (
                ts_us + 3_600_000_000, r.value + UPSERT_VALUE_BUMP)
        else:
            assert got[r.event_id] == (ts_us, r.value)
