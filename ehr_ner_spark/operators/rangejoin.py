"""Banded (bucketized) range join — the classic scale-safe implementation
of an interval/theta join on time.

A naive range join ``probe.ts BETWEEN ref.ts - W AND ref.ts`` is a
cross-product-shaped theta join (Catalyst can only plan
BroadcastNestedLoopJoin for it).  The standard 100-TB shape buckets time
into width-W bands: a reference row in bucket b can only match probe rows
in buckets {b, b+1}, so replicating each REFERENCE row to those two bucket
keys turns the theta join into a plain (key, bucket) equi-join followed by
an exact residual range filter — shuffle volume 2x the small side, hash
join instead of nested loop, and the band width tunes the
selectivity/replication trade-off.  (Same family as the as-of join in
operators/asof.py, which handles the unbounded-preceding case via a union
+ window instead.)

Reference analog: none (the reference has no temporal joins) — this is
part of the engine's relational core, like asof/rollup/percentiles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_count(
    probe: DataFrame,
    ref: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    window_sec: int,
    agg_col: str,
) -> DataFrame:
    """For each probe row: count and sum of ``ref`` rows with the same
    ``key`` and ``ref_ts`` in ``(probe_ts - window_sec, probe_ts]``.
    Output: probe columns + (n_in_window, sum_in_window)."""

    def bucket(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(window_sec))

    p = probe.withColumn("_bkt", bucket(F.col(probe_ts)))
    # replicate the REFERENCE side to the two buckets it can serve
    r = (
        ref.select(
            F.col(key).alias("_rkey"),
            F.col(ref_ts).alias("_rts"),
            F.col(agg_col).alias("_rval"),
        )
        .withColumn("_b0", bucket(F.col("_rts")))
        .withColumn("_bkt", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
    )
    in_window = (
        (F.col("_rts") <= F.col(probe_ts))
        & (F.col("_rts") > F.col(probe_ts) - F.expr(f"INTERVAL {window_sec} SECOND"))
    )
    j = p.join(
        r,
        (p["_bkt"] == r["_bkt"]) & (p[key] == r["_rkey"]) & in_window,
        "left",
    )
    return (
        j.groupBy(*[p[c] for c in probe.columns])
        .agg(
            # count the timestamp, not the value: "rows in window" must not
            # depend on agg_col nullability (the oracle counts p.ts too)
            F.count("_rts").alias("n_in_window"),
            F.round(F.coalesce(F.sum("_rval"), F.lit(0.0)), 2).alias("sum_in_window"),
        )
    )
