"""Streaming jobs: the batch operators under Structured Streaming.

Tested with the file source + ``availableNow`` trigger (bounded drain), the
standard pattern for converting a batch backfill into an incremental job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mention_detect import detect_mentions


def streaming_event_counts(
    spark: SparkSession, source_dir: str, schema, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts over a file-source event stream
    (late rows beyond the watermark are dropped by the state store)."""
    events = spark.readStream.schema(schema).parquet(source_dir)
    # event-time watermarks require TIMESTAMP (source may be TIMESTAMP_NTZ)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_mentions(
    spark: SparkSession, source_dir: str, schema, sink_fn
) -> "StreamingQuery":
    """Incremental mention detection: each micro-batch runs the SAME
    detect_mentions DAG via foreachBatch (exactly the reference pipeline,
    incrementalized)."""
    docs = spark.readStream.schema(schema).parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        corpus_like = batch_df.select(
            "doc_id",
            F.lit("stream").alias("repo"),
            F.sha2("text", 256).alias("content_sha"),
            F.col("text").alias("content"),
        )
        sink_fn(detect_mentions(corpus_like, num_partitions=4), batch_id)

    return (
        docs.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", source_dir + "/_checkpoint")
        .start()
    )


def incremental_mentions(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, timeout_sec: int = 600
) -> DataFrame:
    """Driver-checkable incremental mention detection (§2.9 evidence).

    Deterministic micro-batch schedule: the documents table is split into
    ``n_chunks`` single-file chunks by ``doc_id % n_chunks``; the file
    source reads them with ``maxFilesPerTrigger=1`` under an availableNow
    trigger, so the run is exactly ``n_chunks`` micro-batches regardless of
    host timing.  Each micro-batch runs the SAME corpus derivation +
    detect_mentions DAG as the batch ``kg_mentions`` plan (foreachBatch) and
    appends to a parquet sink; the accumulated union is returned — per-doc
    independence of the detector makes it equal to the batch result, so the
    driver hash-checks it against the identical mentions oracle.

    The returned frame is localCheckpoint-materialized so the temp dirs can
    be removed before the caller collects (evidence-surface only — the
    production streaming path writes to a durable sink instead).
    """
    import glob
    import os
    import shutil
    import tempfile

    from ..corpus import corpus_from_docs

    work = tempfile.mkdtemp(prefix="kg_mentions_stream_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for i in range(n_chunks):
            chunk_dir = os.path.join(work, f"chunk{i}")
            docs.where(F.col("doc_id") % n_chunks == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            from ..operators.mention_detect import detect_mentions

            detect_mentions(corpus_from_docs(batch_df), num_partitions=4).select(
                "doc_id", "type", "start_pos", "end_pos", "text"
            ).write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(process)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("incremental_mentions stream did not drain")
        n_batches = len(q.recentProgress)
        if n_batches < 2:
            raise RuntimeError(
                f"expected >=2 micro-batches, saw {n_batches} — the schedule "
                "must be incremental for the evidence to mean anything"
            )
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


ATTRIB_WINDOW_SEC = 7200     # click -> purchase attribution lookback
ATTRIB_WATERMARK = "4 hours"  # > window: boundary clicks stay in state


def stream_stream_attribution(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, timeout_sec: int = 600
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (§2.9): click -> purchase
    attribution — each purchase joined to the same user's clicks within the
    preceding ``ATTRIB_WINDOW_SEC`` — run as Spark's native stream-stream
    inner join (both sides ``withWatermark`` + an event-time range
    condition, so join state is EVICTED as the watermark advances: bounded
    state at unbounded input, the property that matters at production
    scale).

    Deterministic schedule: both sides read the events table chunked into
    ``n_chunks`` files in EVENT-TIME ORDER (equal-width ts ranges), so the
    watermark advances monotonically between micro-batches and only past
    the window boundary — making the accumulated append sink provably
    equal to the batch interval join, which is exactly what the driver
    hash-checks (oracle: plain SQL range join on the same table).
    """
    import glob
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rel_stream_join_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            # parquet NTZ -> TIMESTAMP (the session tz is UTC in every
            # entry point), matching the epoch_us discipline of
            # operators/timeseries.py; all downstream arithmetic is
            # difference-based so it is tz-offset invariant anyway
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        lo_us, hi_us = ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()
        width = (hi_us - lo_us) // n_chunks + 1
        bucket = (
            (F.unix_micros("ts") - F.lit(lo_us)) / F.lit(width)
        ).cast("int")
        chunked = ev.withColumn("_b", bucket)
        for i in range(n_chunks):
            chunk_dir = os.path.join(work, f"chunk{i}")
            chunked.where(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
                "overwrite"
            ).parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))

        schema = ev.schema

        def side(event_type: str, id_alias: str, ts_alias: str):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .where(F.col("event_type") == event_type)
                .select(
                    F.col("event_id").alias(id_alias),
                    F.col("user_id"),
                    F.col("ts").alias(ts_alias),
                )
                .withWatermark(ts_alias, ATTRIB_WATERMARK)
            )

        clicks = side("click", "click_id", "click_ts")
        purchases = side("purchase", "purchase_id", "purchase_ts").select(
            F.col("user_id").alias("p_user_id"), "purchase_id", "purchase_ts"
        )
        joined = clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts")
                - F.expr(f"INTERVAL {ATTRIB_WINDOW_SEC} SECONDS")
            ),
            "inner",
        ).select(
            "user_id",
            "click_id",
            "purchase_id",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(click_ts))"
                " DIV 1000000"
            ).alias("gap_sec"),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("stream-stream join did not drain")
        n_batches = len(q.recentProgress)
        if n_batches < 2:
            raise RuntimeError(
                f"expected >=2 micro-batches, saw {n_batches}"
            )
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


DEDUP_WATERMARK = "4 hours"   # >> one chunk's time span: dupes never re-emit


def stream_dedup(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3, timeout_sec: int = 600
) -> DataFrame:
    """Watermarked STREAMING DEDUPLICATION (§2.9): ``dropDuplicates`` on
    ``(event_id, ts)`` over a file stream where every chunk arrives TWICE
    (the at-least-once delivery fault a streaming ingest must absorb) —
    the event-time column in the dedup subset lets the state store EVICT
    seen keys as the watermark advances: bounded state at unbounded input.

    Deterministic schedule: the events table is cut into ``n_chunks``
    equal-width event-time ranges and each chunk file is written twice
    (``-a``/``-b``, adjacent in the lexicographic file order the source
    follows), so every duplicate arrives one micro-batch after its
    original — far inside the watermark, hence exactly-once output.  The
    kept-row arbitrariness of dropDuplicates is immaterial: duplicate rows
    are byte-identical.  Output matches ``SELECT DISTINCT`` over the
    table, which is what the driver hash-checks.
    """
    import glob
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rel_stream_dedup_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        lo_us, hi_us = ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()
        width = (hi_us - lo_us) // n_chunks + 1
        bucket = (
            (F.unix_micros("ts") - F.lit(lo_us)) / F.lit(width)
        ).cast("int")
        chunked = ev.withColumn("_b", bucket)
        for i in range(n_chunks):
            chunk_dir = os.path.join(work, f"chunk{i}")
            chunked.where(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
                "overwrite"
            ).parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            # the duplicated delivery: same bytes, two files
            shutil.copy(part, os.path.join(src, f"chunk-{i:03d}-b.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}-a.parquet"))

        deduped = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", DEDUP_WATERMARK)
            .dropDuplicates(["event_id", "ts"])
            .select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
            )
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("stream dedup did not drain")
        n_batches = len(q.recentProgress)
        if n_batches < 2:
            raise RuntimeError(f"expected >=2 micro-batches, saw {n_batches}")
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def sessionize_stream_closed(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4,
    timeout_sec: int = 600
) -> DataFrame:
    """Driver-checkable STATEFUL streaming evidence: the
    applyInPandasWithState sessionizer (streaming/sessionize.py) run over
    a deterministic time-ordered micro-batch schedule, returning the
    closed sessions the state store emitted.

    The events table splits into ``n_chunks`` single-file chunks at exact
    time quantile boundaries — time-ordered arrival, so the keyed state
    sees each user's events in the same (ts, event_id) order the batch
    window does, and the closed-session stream equals the batch
    sessionization minus each user's final (still-open) session.  That
    difference is expressed in the ORACLE (drop the max-session_start row
    per user), so a green driver row proves the stateful operator's
    output — not a batch re-derivation — matches SQL semantics.

    Ties at a chunk boundary are safe by construction: equal timestamps
    can never exceed the session gap, so splitting them across
    micro-batches cannot move a session boundary.
    """
    import glob
    import os
    import shutil
    import tempfile

    from .sessionize import sessionize_stream

    work = tempfile.mkdtemp(prefix="rel_sessionize_stream_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "ts", "user_id", "value"
        )
        qs = [i / n_chunks for i in range(1, n_chunks)]
        bounds = ev.select(
            F.expr(
                "percentile(unix_micros(cast(ts as timestamp)), array("
                + ", ".join(str(q) for q in qs)
                + "))"
            ).alias("b")
        ).collect()[0]["b"]
        lo = None
        for i, hi in enumerate(list(bounds) + [None]):
            chunk = ev
            us = F.unix_micros(F.col("ts").cast("timestamp"))
            if lo is not None:
                chunk = chunk.where(us > F.lit(lo))
            if hi is not None:
                chunk = chunk.where(us <= F.lit(hi))
            chunk_dir = os.path.join(work, f"chunk{i}")
            chunk.coalesce(1).write.mode("overwrite").parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))
            lo = hi

        global _SESS_STREAM_SEQ
        _SESS_STREAM_SEQ += 1
        name = f"sess_closed_{os.getpid()}_{_SESS_STREAM_SEQ}"
        q = (
            sessionize_stream(spark, src, ev.schema, max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("sessionize stream did not drain")
        n_batches = len(q.recentProgress)
        if n_batches < 2:
            raise RuntimeError(
                f"expected >=2 micro-batches, saw {n_batches}"
            )
        return (
            spark.table(name)
            .withColumn("n_events", F.col("n_events").cast("long"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


_SESS_STREAM_SEQ = 0


LATE_WINDOW_SEC = 21600        # 6 h tumbling windows
LATE_DELAY_SEC = 45000         # 12.5 h watermark delay (> window: no
                               # boundary window closes before its
                               # neighbours' chunk arrives)
LATE_STRAGGLER_MOD = 17        # event_id % MOD == 0 in the early range
                               # arrives LAST (out-of-order delivery)


def watermark_late_audit(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 600
) -> DataFrame:
    """Driver-checkable evidence that the WATERMARK actually DROPS late
    data: a tumbling-window count in append mode, fed a deterministic
    out-of-order schedule where a straggler subset of the EARLY events
    (``event_id % 17 == 0`` and ts below the 60%-range cut, integer
    arithmetic both engines replay) is delivered AFTER the stream has seen
    the global max timestamp.  By then even the late-data FILTERING
    watermark (one batch behind the eviction watermark) sits ~12.5 h
    behind the 80% cut — days past every straggler's 6 h window — so all
    stragglers are dropped by the late-data filter and NONE re-opens a
    window that an earlier batch finalized.

    The ORACLE expresses exactly that: per-window counts over the
    NON-straggler rows only, restricted to windows whose end is at or
    before the final watermark ``(max_us // 1000 - delay_ms) * 1000``
    (Spark tracks event-time stats in floored milliseconds) — windows
    still open when the stream drains are never emitted in append mode.
    A green row therefore proves three behaviors at once: late-row drop,
    append-mode finalization, and the ms-floored watermark arithmetic.

    The run also asserts the state store REPORTED dropping every
    straggler (``numRowsDroppedByWatermark``), so a silently-absorbed
    late row fails loudly rather than surfacing as a hash mismatch.
    """
    import glob
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rel_watermark_late_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        lo_us, hi_us = ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()
        # Spark state operators hold TWO watermarks per batch: late-data
        # filtering uses the PREVIOUS batch's value, eviction the current
        # one.  The straggler cut therefore sits at the 60% point while the
        # chunk boundary sits at 80%: every straggler window ends >= 0.2 x
        # range - window (days) below even the FILTERING watermark of the
        # straggler batch (max(chunk0) - delay ~= cut80 - 12.5 h), so no
        # straggler can slip between the two watermarks and contaminate a
        # window emitted later.
        cut_us = lo_us + ((hi_us - lo_us) * 4) // 5
        strag_cut_us = lo_us + ((hi_us - lo_us) * 3) // 5
        us = F.unix_micros("ts")
        straggler = (F.col("event_id") % LATE_STRAGGLER_MOD == 0) & (
            us < F.lit(strag_cut_us)
        )
        chunks = [
            ev.where(~straggler & (us < F.lit(cut_us))),   # early, on time
            ev.where(us >= F.lit(cut_us)),                 # tail (has max)
            ev.where(straggler),                           # stragglers LAST
        ]
        # numRowsDroppedByWatermark counts rows AFTER the map-side partial
        # aggregation — one row per distinct straggler window (the chunk is
        # a single small file, hence a single map partition) — so the exact
        # expectation is the distinct-window count, not the raw row count.
        wlen_us = LATE_WINDOW_SEC * 1_000_000
        n_late = (
            chunks[2]
            .select((us - us % F.lit(wlen_us)).alias("w"))
            .distinct()
            .count()
        )
        for i, chunk in enumerate(chunks):
            chunk_dir = os.path.join(work, f"chunk{i}")
            chunk.coalesce(1).write.mode("overwrite").parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))

        counts = (
            spark.readStream.schema(chunks[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", f"{LATE_DELAY_SEC} seconds")
            .groupBy(F.window("ts", f"{LATE_WINDOW_SEC} seconds"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.unix_micros("window.start").alias("window_start_us"),
                F.unix_micros("window.end").alias("window_end_us"),
                "n_events",
            )
        )
        q = (
            counts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("watermark-late stream did not drain")
        progress = q.recentProgress
        if len(progress) < 3:
            raise RuntimeError(
                f"expected >=3 micro-batches, saw {len(progress)}"
            )
        import json as _json

        dropped = sum(
            int(s["numRowsDroppedByWatermark"])
            for p in progress
            for s in (
                p if isinstance(p, dict) else _json.loads(p.json)
            )["stateOperators"]
        )
        if dropped != n_late:
            raise RuntimeError(
                f"watermark dropped {dropped} partial rows, expected "
                f"exactly the {n_late} distinct straggler windows behind "
                f"the final watermark"
            )
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stream_static_enrich(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3, timeout_sec: int = 600
) -> DataFrame:
    """STREAM-STATIC JOIN (§2.9): enrich a streaming event feed with the
    static customer dimension — the standard Structured Streaming
    enrichment shape (the static side is re-planned per micro-batch and
    broadcast under AQE; no state store is involved because the static
    side is immutable within the query).

    Deterministic schedule: events cut into ``n_chunks`` event-time
    ranges, one file per micro-batch (maxFilesPerTrigger=1 under
    availableNow).  Every event matches (user_id range is a subset of
    c_custkey), so the enriched append sink equals the batch equi-join,
    which is what the driver hash-checks.  Output: (event_id, ts_us,
    user_id, event_type, segment)."""
    import glob
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rel_stream_static_")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        lo_us, hi_us = ev.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()
        width = (hi_us - lo_us) // n_chunks + 1
        bucket = (
            (F.unix_micros("ts") - F.lit(lo_us)) / F.lit(width)
        ).cast("int")
        chunked = ev.withColumn("_b", bucket)
        for i in range(n_chunks):
            chunk_dir = os.path.join(work, f"chunk{i}")
            chunked.where(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
                "overwrite"
            ).parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))

        dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
        enriched = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .join(dim, "user_id")
            .select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
                "segment",
            )
        )
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("stream-static join did not drain")
        n_batches = len(q.recentProgress)
        if n_batches < 2:
            raise RuntimeError(f"expected >=2 micro-batches, saw {n_batches}")
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


UPSERT_UPDATE_MOD = 5       # every 5th event gets a later-ts correction
UPSERT_VALUE_BUMP = 1000.0


def stream_upsert(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 600
) -> DataFrame:
    """foreachBatch IDEMPOTENT MERGE sink (§2.9) — the production
    exactly-once pattern for keyed sinks: each micro-batch merges into a
    keyed table (keep the max-``ts`` version per ``event_id``, ties by
    higher value), so replays and in-stream corrections both land
    idempotently.

    Deterministic schedule: batch 0 = the full events table; batch 1 = a
    correction feed (every ``UPSERT_UPDATE_MOD``-th event re-emitted with
    ts + 1 hour and value + ``UPSERT_VALUE_BUMP``); batch 2 = the SAME
    correction feed replayed (at-least-once delivery).  The final table
    must equal the last-version-per-key SQL — replay must change
    nothing, which is what the driver hash-checks.  The merge itself is
    a keyed window over (existing ∪ batch) — at warehouse scale the
    same foreachBatch body targets a MERGE INTO on the lakehouse table.
    Output: (event_id, ts_us, user_id, event_type, value)."""
    import glob
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rel_stream_upsert_")
    src = os.path.join(work, "src")
    state = os.path.join(work, "state")
    os.makedirs(src)
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        corrections = ev.where(
            F.col("event_id") % UPSERT_UPDATE_MOD == 0
        ).select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            "user_id",
            "event_type",
            (F.col("value") + UPSERT_VALUE_BUMP).alias("value"),
        )
        for i, frame in enumerate([ev, corrections, corrections]):
            chunk_dir = os.path.join(work, f"chunk{i}")
            frame.coalesce(1).write.mode("overwrite").parquet(chunk_dir)
            (part,) = glob.glob(os.path.join(chunk_dir, "part-*.parquet"))
            os.replace(part, os.path.join(src, f"chunk-{i:03d}.parquet"))

        from pyspark.sql.window import Window

        def merge_batch(batch_df, batch_id: int) -> None:
            spark_b = batch_df.sparkSession
            if os.path.exists(os.path.join(state, "_SUCCESS")):
                current = spark_b.read.parquet(state)
                union = current.unionByName(batch_df)
            else:
                union = batch_df
            w = Window.partitionBy("event_id").orderBy(
                F.desc("ts"), F.desc("value")
            )
            merged = (
                union.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            tmp = state + f".tmp-{batch_id}"
            merged.write.mode("overwrite").parquet(tmp)
            if os.path.exists(state):
                shutil.rmtree(state)
            os.replace(tmp, state)

        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError("stream upsert did not drain")
        if len(q.recentProgress) < 3:
            raise RuntimeError(
                f"expected >=3 micro-batches, saw {len(q.recentProgress)}"
            )
        final = spark.read.parquet(state).select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
