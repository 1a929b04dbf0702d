"""As-of (time-travel) join — a classic operator absent from the reference
(SURVEY.md §2.3 'absent' list) supplied Spark-first.

Implementation: the union + windowed last-value trick, NOT a range-condition
join — a theta/range join explodes into a broadcast nested loop or an
O(n·m) shuffle at scale, while this shape is one shuffle on (key) and one
ordered window scan per partition:

    probe(key, ts, ...) ⋈asof ref(key, ts, payload)
      = union both streams tagged by side
        -> window over (key) ordered by (ts, side)   [ref sorts first on tie
                                                      so <= semantics hold]
        -> last(payload, ignorenulls) up to current row
        -> keep probe rows

Reference rows must be unique per (key, ts) for determinism (pre-aggregate
if not)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """For each probe row: the payload of the latest ref row with
    ``ref.ts <= probe.ts`` and equal key (nulls when none precedes)."""
    p = probe.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(probe_ts))
    for c in payload_cols:
        p = p.withColumn(c, F.lit(None).cast(ref.schema[c].dataType))
    r = ref.select(
        F.col(key),
        F.col(ref_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload_cols],
    )
    for c in probe.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))

    unioned = p.select(*sorted(set(p.columns))).unionByName(
        r.select(*sorted(set(r.columns)))
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in payload_cols],
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side", "_ts")
