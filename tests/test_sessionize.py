"""Stateful-streaming sessionization: closed sessions from the
applyInPandasWithState stream must equal the batch sessionization's closed
sessions (each user's final session may legitimately still be open in the
state store when the bounded stream drains)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def _key(r):
    return (r.user_id, r.session_start, r.session_end, r.n_events,
            round(r.sum_value, 4))


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id") < 40)
        .select("event_id", "ts", "user_id", "value")
    )
    # two time-ordered files -> two micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "events_src")
    mid = events.approxQuantile("event_id", [0.5], 0)[0]
    events.where(F.col("event_id") <= mid).coalesce(1).write.parquet(
        src + "/b0"
    )
    events.where(F.col("event_id") > mid).coalesce(1).write.parquet(
        src + "/b1"
    )
    # flatten into one dir with lexically ordered file names
    import glob
    import os
    import shutil

    os.makedirs(src + "/in", exist_ok=True)
    for i, b in enumerate(("b0", "b1")):
        for f in sorted(glob.glob(f"{src}/{b}/part-*.parquet")):
            shutil.copy(f, f"{src}/in/{i:02d}.parquet")

    out = sessionize_stream(
        spark, src + "/in", events.schema, max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", src + "/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        _key(r) for r in spark.sql("SELECT * FROM sess").collect()
    }

    # batch truth: drop each user's last (possibly-still-open) session
    batch = sessionize_batch(events).collect()
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_start > cur.session_start:
            last_per_user[r.user_id] = r
    closed = {
        _key(r) for r in batch if r is not last_per_user[r.user_id]
    }
    assert streamed == closed
    assert len(streamed) > 0
