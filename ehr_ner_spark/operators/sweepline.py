"""Sweep-line concurrency profile: max simultaneously-open intervals per
hour — the load/occupancy question (concurrent sessions, admitted patients,
open connections) every events table eventually gets asked.

The naive answer is a running sum over ONE globally-ordered window — a
single-task sort at any scale.  This operator is the distributed two-phase
prefix-sum instead (the same discipline as the CSR offset build):

1. open/close marks are NETTED per (hour bucket, timestamp) by a map-side
   combinable aggregate — the only full-data shuffle, keyed on (bucket, t);
2. the intra-bucket running sum is a window PARTITIONED BY bucket (bounded:
   one hour of distinct timestamps per task);
3. the cross-bucket carry is an exclusive prefix sum over the per-bucket
   totals — a frame with ONE ROW PER HOUR, which does not grow with the
   corpus, so its single-partition window is a constant-size driver-scale
   step at any data volume.

Close-before-open (half-open intervals [t, t+W)) is encoded by netting:
concurrency evaluated at t is carry + running net THROUGH t, which equals
"after closes and opens at t" — no per-row ordering tie to break, so the
result is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW_S = 300  # each event holds a session open for 5 minutes


def concurrency_profile(events: DataFrame, window_s: int = WINDOW_S) -> DataFrame:
    """``events (event_id, ts, ...)`` -> per-hour
    ``(hour, n_opens, max_concurrency)``."""
    # both marks from ONE scan: an inline generator (2 rows per event)
    # instead of a UNION ALL that reads the events table twice
    marks = (
        events.select(
            F.explode(
                F.array(
                    F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                    F.struct(
                        (F.col("ts") + F.expr(f"INTERVAL {window_s} SECONDS"))
                        .alias("t"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("m")
        )
        .select(F.col("m.t").alias("t"), F.col("m.delta").alias("delta"))
        .withColumn("bucket", F.date_trunc("hour", F.col("t")))
        .groupBy("bucket", "t")
        .agg(
            F.sum("delta").alias("net"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("opens"),
        )
    )
    intra = Window.partitionBy("bucket").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marks = marks.withColumn("run", F.sum("net").over(intra))
    # per-bucket totals: one row per hour — bounded, not data-sized
    totals = marks.groupBy("bucket").agg(
        F.sum("net").alias("btot"),
        F.max("run").alias("bmax"),
        F.sum("opens").cast("long").alias("n_opens"),
    )
    carry_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        totals.withColumn(
            "carry", F.coalesce(F.sum("btot").over(carry_w), F.lit(0))
        )
        .select(
            F.col("bucket").alias("hour"),
            "n_opens",
            (F.col("carry") + F.col("bmax")).cast("long")
            .alias("max_concurrency"),
        )
    )


def concurrency_profile_sql(window_s: int = WINDOW_S) -> str:
    """DuckDB twin — identical netting, identical two-phase prefix sum."""
    return f"""
    WITH marks AS (
      SELECT t, SUM(delta) AS net,
             SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS opens,
             date_trunc('hour', t) AS bucket
      FROM (
        SELECT ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT ts + INTERVAL {window_s} SECOND, -1 FROM events)
      GROUP BY t, date_trunc('hour', t)),
    run AS (
      SELECT bucket, t, net, opens,
             SUM(net) OVER (PARTITION BY bucket ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM marks),
    totals AS (
      SELECT bucket, SUM(net) AS btot, MAX(run) AS bmax,
             SUM(opens)::BIGINT AS n_opens
      FROM run GROUP BY bucket),
    carried AS (
      SELECT bucket, n_opens, bmax,
             COALESCE(SUM(btot) OVER (ORDER BY bucket
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS carry
      FROM totals)
    SELECT bucket AS hour, n_opens,
           (carry + bmax)::BIGINT AS max_concurrency
    FROM carried
    """
