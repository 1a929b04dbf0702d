"""Cohort retention over the event log — the classic product-analytics
rollup (group users by first-activity week, then measure what fraction of
each cohort is still active N weeks later), here as a scale-safe pure
relational plan:

* user first-activity is ONE map-side-combined MIN per user;
* per-user active weeks are ONE distinct (user, week) aggregation —
  the shuffle carries user x active-week, never raw events;
* the cohort join is 1:1 on user_id; cohort/offset counts and sizes are
  two more combinable aggregations.  No window anywhere.

Calendar discipline: weeks are ``epoch_day // 7`` — pure integer
arithmetic on days-since-1970, identical in Spark and DuckDB, instead of
``date_trunc('week', ...)`` whose week-start convention is an engine
knob.  Retention is one small-integer division snapped to the shared
1e-6 half-away grid, so the twin is bit-exact.

Reference contact: none (event-log analytics; relational-surface family,
same table as rel_sessionize / rel_funnel / rel_events_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def _week(col):
    """Timestamp column -> integer week index (epoch_day // 7)."""
    return F.expr(
        f"datediff(to_date({col}), DATE '{EPOCH}') div 7"
    ).cast("long")


def cohort_retention(events: DataFrame) -> DataFrame:
    """events(user_id, ts) -> (cohort_week, week_offset, n_active,
    cohort_size, retention) for every observed (cohort, offset) cell."""
    firsts = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", _week("first_ts").alias("cohort_week"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        events.select("user_id", _week("ts").alias("week"))
        .distinct()
    )
    cells = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.floor(
                F.col("n_active").cast("double") / F.col("cohort_size")
                * F.lit(1000000.0) + F.lit(0.5)
            ) / F.lit(1000000.0)).alias("retention"),
        )
    )


def cohort_retention_sql() -> str:
    """DuckDB twin: identical integer week indices, counts, and snap."""
    wk = "date_diff('day', DATE '1970-01-01', CAST({c} AS DATE)) // 7"
    return f"""
    WITH firsts AS (
      SELECT user_id,
             {wk.format(c='MIN(ts)')} AS cohort_week
      FROM events GROUP BY user_id),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM firsts GROUP BY cohort_week),
    active AS (
      SELECT DISTINCT user_id, {wk.format(c='ts')} AS week
      FROM events),
    cells AS (
      SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
             COUNT(*) AS n_active
      FROM active a JOIN firsts f ON f.user_id = a.user_id
      GROUP BY f.cohort_week, a.week - f.cohort_week)
    SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
           FLOOR(c.n_active::DOUBLE / s.cohort_size * 1000000.0 + 0.5)
             / 1000000.0 AS retention
    FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
    """
