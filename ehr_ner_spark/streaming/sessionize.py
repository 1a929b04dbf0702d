"""Sessionization — gap-based session windows per user.

* :func:`sessionize_batch` — the relational form: lag -> gap flag -> running
  sum session ids -> groupBy.  Fully SQL-expressible (DuckDB oracle
  ``rel_sessionize``); one shuffle on user_id, window scan per partition.
* :func:`sessionize_stream` — the incremental form with explicit keyed state
  (``applyInPandasWithState``): state carries the open session per user;
  a session closes when an event at least ``gap`` later arrives (or the
  group times out).  Closed sessions are emitted append-mode.

The reference has no streaming (SURVEY §2.9); this is engine-supplied
infrastructure for the events table."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

GAP_MINUTES = 30

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """(user_id, ts, value) -> one row per session."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    flagged = events.select(
        "user_id", "ts", "value", "event_id",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000.0
            - F.lag(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000.0
            ).over(w)
            > gap,
            1,
        ).otherwise(0).alias("new_session"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).drop("session_id")


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM numbered GROUP BY user_id, session_id
"""


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    gap_minutes: int = GAP_MINUTES,
    max_files_per_trigger: int = 1,
):
    """File-source stream -> closed sessions (append mode).  Open sessions
    stay in the keyed state store until a later event (or timeout on a live
    stream) closes them."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start_us, last_us, n_ev, sv = state.get
        else:
            start_us = last_us = -1
            n_ev, sv = 0, 0.0
        closed = []
        for ts, val in zip(rows["ts"], rows["value"]):
            t = _us(ts)
            if last_us >= 0 and t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n_ev, sv))
                start_us, n_ev, sv = t, 0, 0.0
            if last_us < 0:
                start_us = t
            last_us = t
            n_ev += 1
            sv += float(val)
        state.update((start_us, last_us, n_ev, sv))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 4) for c in closed],
                }
            )

    events = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    ).parquet(source_dir)
    return (
        events.select("user_id", "ts", "value", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
