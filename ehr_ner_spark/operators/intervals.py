"""Interval analytics: a banded interval-OVERLAP join and temporal
entity validity intervals (gaps-and-islands coalescing).

1. ``interval_join``: user sessions (gaps-and-islands over the event
   stream, the ``streaming/sessionize.py`` semantics) overlap-joined
   against global incident windows (high-value error events widened to a
   fixed horizon).  A naive ``s_start <= i_end AND i_start <= s_end``
   predicate is a pure theta join — Catalyst can only plan
   BroadcastNestedLoopJoin, which is quadratic when BOTH interval sets
   scale with the corpus.  The 100-TB shape explodes EACH interval to the
   fixed-width time bands it covers (``sequence()`` on the banded epoch),
   turns the theta join into a plain band equi-join, applies the exact
   overlap predicate as a residual filter, and emits every overlapping
   pair EXACTLY ONCE without a ``distinct`` by keeping only the FIRST
   band the two intervals share (``band == greatest(s_start, i_start)
   DIV W`` — that instant lies in both intervals, so its band is in both
   explosions, and it is unique per pair).  Shuffle volume is
   Σ interval-span/W + 1 per side — tuned by W — and the join is a hash
   join, never a nested loop.  Same family as the point-in-window range
   join (operators/rangejoin.py) and the as-of join (operators/asof.py);
   this one handles the interval×interval case both of those avoid.

2. ``entity_intervals``: the temporal-KG side of kg_entity_trend — per
   mention surface, coalesce the equal-width doc-id ingest buckets where
   the surface is attested into maximal consecutive runs (validity
   intervals), the classic gaps-and-islands on an integer axis
   (``b - ROW_NUMBER()`` is constant within a run).  All windows are
   keyed by surface over at most N_BUCKETS rows per key — key-local and
   constant-bounded at any corpus size.

Reference analog: none (the reference has no temporal operators) — this
extends the relational/KG core; the ingest-bucket time axis is the one
kg_entity_trend (operators/trend.py) established over the corpus count
matrices of the reference's dataPipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..streaming.sessionize import GAP_MINUTES

# incident horizon: a qualifying error event opens a 1-hour window
INCIDENT_S = 3600
# error events this valuable become incidents (thins the incident side
# deterministically; the double compares bit-identically on both engines)
INCIDENT_MIN_VALUE = 15.0
# band width for the banded overlap join
BAND_S = 4 * 3600

N_BUCKETS = 16
MIN_RUN_MENTIONS = 8

_US = 1_000_000


def _sessions(events: DataFrame, gap_minutes: int) -> DataFrame:
    """(user_id, s_start, s_end) in epoch micros — sessionize_batch's
    islands, kept as BIGINT interval endpoints."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.lit(gap_minutes * 60 * _US)
    flagged = events.select(
        "user_id", "ts", "event_id", us.alias("t_us"),
        F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(0).alias("new_s"),
    ).withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "sid").agg(
        F.min("t_us").alias("s_start"), F.max("t_us").alias("s_end")
    ).drop("sid")


def interval_join(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    incident_s: int = INCIDENT_S,
    band_s: int = BAND_S,
) -> DataFrame:
    """``events (event_id, ts, user_id, event_type, value)`` -> per
    session touched by >= 1 incident window:
    ``(user_id, s_start_us, s_end_us, n_incidents, overlap_us)`` with
    exact BIGINT micro overlap mass (closed intervals; touching counts
    with overlap 0)."""
    band_us = band_s * _US
    sess = _sessions(events, gap_minutes).withColumn(
        "b", F.explode(F.expr(f"sequence(s_start DIV {band_us}, "
                              f"s_end DIV {band_us})"))
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    inc = (
        events.where(
            (F.col("event_type") == "error")
            & (F.col("value") >= F.lit(INCIDENT_MIN_VALUE))
        )
        .select(us.alias("i_start"),
                (us + F.lit(incident_s * _US)).alias("i_end"))
        .withColumn(
            "b", F.explode(F.expr(f"sequence(i_start DIV {band_us}, "
                                  f"i_end DIV {band_us})"))
        )
    )
    overlap = (
        (F.col("s_start") <= F.col("i_end"))
        & (F.col("i_start") <= F.col("s_end"))
        # first shared band only: each overlapping pair survives exactly
        # once, so the aggregate needs no distinct
        & (F.col("b") == F.expr(f"greatest(s_start, i_start) DIV {band_us}"))
    )
    return (
        sess.join(inc, "b").where(overlap)
        .groupBy("user_id", "s_start", "s_end")
        .agg(
            F.count(F.lit(1)).alias("n_incidents"),
            F.sum(
                F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
            ).alias("overlap_us"),
        )
        .select(
            "user_id",
            F.col("s_start").alias("s_start_us"),
            F.col("s_end").alias("s_end_us"),
            "n_incidents", "overlap_us",
        )
    )


def interval_join_sql(
    gap_minutes: int = GAP_MINUTES,
    incident_s: int = INCIDENT_S,
) -> str:
    """DuckDB twin — the PLAIN inequality join (the semantics, not the
    banded physical shape), same closed-interval overlap mass."""
    return f"""
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > {gap_minutes * 60 * _US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    sessions AS (
      SELECT user_id, MIN(t_us) AS s_start, MAX(t_us) AS s_end
      FROM numbered GROUP BY user_id, sid),
    incidents AS (
      SELECT epoch_us(ts) AS i_start,
             epoch_us(ts) + {incident_s * _US} AS i_end
      FROM events
      WHERE event_type = 'error' AND value >= {INCIDENT_MIN_VALUE}),
    pairs AS (
      SELECT s.user_id, s.s_start, s.s_end,
             LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start) AS ov
      FROM sessions s JOIN incidents i
        ON s.s_start <= i.i_end AND i.i_start <= s.s_end)
    SELECT user_id, s_start AS s_start_us, s_end AS s_end_us,
           COUNT(*)::BIGINT AS n_incidents, SUM(ov)::BIGINT AS overlap_us
    FROM pairs GROUP BY 1, 2, 3
    """


def entity_intervals(
    mentions: DataFrame,
    n_buckets: int = N_BUCKETS,
    min_run_mentions: int = MIN_RUN_MENTIONS,
) -> DataFrame:
    """Mentions ``(doc_id, text, ...)`` -> per surface, maximal runs of
    consecutive attested ingest buckets:
    ``(text, start_b, end_b, n_buckets_run, n_mentions)``; runs with
    fewer than ``min_run_mentions`` mentions are dropped."""
    mx = mentions.agg(F.max("doc_id").alias("max_id"))
    per_bucket = (
        mentions.crossJoin(F.broadcast(mx))
        .select(
            "text",
            F.least(
                F.expr(f"(doc_id * {n_buckets}) DIV (max_id + 1)"),
                F.lit(n_buckets - 1).cast("long"),
            ).alias("b"),
        )
        .groupBy("text", "b")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("text").orderBy("b")
    runs = per_bucket.withColumn(
        "grp", F.col("b") - F.row_number().over(w)
    )
    return (
        runs.groupBy("text", "grp")
        .agg(
            F.min("b").alias("start_b"),
            F.max("b").alias("end_b"),
            F.count(F.lit(1)).alias("n_buckets_run"),
            F.sum("y").alias("n_mentions"),
        )
        .where(F.col("n_mentions") >= min_run_mentions)
        .drop("grp")
    )


def entity_intervals_sql(
    mentions_sql: str,
    n_buckets: int = N_BUCKETS,
    min_run_mentions: int = MIN_RUN_MENTIONS,
) -> str:
    """DuckDB twin — identical bucketing, islands and run filter."""
    return f"""
    WITH mentions AS ({mentions_sql}),
    mx AS (SELECT MAX(doc_id) AS max_id FROM mentions),
    per_bucket AS (
      SELECT text,
             LEAST((doc_id * {n_buckets}) // (max_id + 1),
                   {n_buckets - 1}) AS b,
             COUNT(*) AS y
      FROM mentions, mx
      GROUP BY 1, 2),
    runs AS (
      SELECT text, b, y,
             b - ROW_NUMBER() OVER (PARTITION BY text ORDER BY b) AS grp
      FROM per_bucket)
    SELECT text, MIN(b)::BIGINT AS start_b, MAX(b)::BIGINT AS end_b,
           COUNT(*)::BIGINT AS n_buckets_run, SUM(y)::BIGINT AS n_mentions
    FROM runs GROUP BY text, grp
    HAVING SUM(y) >= {min_run_mentions}
    """
