"""Distributed 2-D skyline (Pareto frontier): the rows no other row
dominates — here the price/size frontier over ``part`` (cheapest part at
every size level, the classic "best tradeoff" catalog query).

Dominance (minimize price, maximize size): ``d`` dominates ``t`` iff
``d.price <= t.price AND d.size >= t.size`` with at least one strict.
A row survives iff

* its size is the MAX size at its exact price, and
* its size strictly exceeds the max size over all strictly-lower prices.

The naive formulation is a quadratic NOT EXISTS self-join (the DuckDB twin
keeps it as the independent oracle).  The engine instead computes the
frontier with the house two-phase prefix discipline — this time a prefix
**max** (sweepline.py / csr.py are prefix sums):

1. per-price max size: ONE map-side-combinable aggregate keyed on
   price_cents — the only full-data shuffle, and it shrinks the problem to
   one row per distinct price;
2. the exclusive prefix max over price order runs on the per-price frame,
   banded: intra-band running max is a window PARTITIONED BY the price
   band (bounded work per task), the cross-band carry is an exclusive
   prefix max over the one-row-per-band totals frame, which does not grow
   with the corpus — no data-sized global window anywhere;
3. survivors are a 1:1 equi-join of the rows against their price's
   ``(max_at_price, prefix_max)`` pair plus a map-only filter.

Duplicate maximal (price, size) pairs are BOTH kept (neither strictly
dominates the other) — by the engine's filter and the oracle's NOT EXISTS
alike; pinned by unit test.

Prices enter as exact integer cents (ROUND half-away, identical in Spark
and DuckDB for positive values) so the frontier never hinges on double
comparison.

Reference analog: none (engine-supplied relational surface, like the
interval and as-of joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist
from .parallelism import fan_out

BAND_CENTS = 10_000  # 100-dollar price bands for the two-phase prefix max


def skyline_price_size(part_in: DataFrame,
                       band_cents: int = BAND_CENTS) -> DataFrame:
    """``part`` -> the Pareto frontier on (price_cents minimize,
    p_size maximize).  Output: (p_partkey, price_cents, p_size)."""
    rows = fan_out(part_in).select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    # two consumers: the per-price max build and the survivor join
    rows = tracked_persist(rows)

    pm = rows.groupBy("price_cents").agg(F.max("p_size").alias("max_at"))
    pm = pm.withColumn("band", F.expr(f"price_cents DIV {band_cents}"))
    intra_w = (
        Window.partitionBy("band")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pm = pm.withColumn("intra_max", F.max("max_at").over(intra_w))
    # one row per band — constant-scale frame for the global carry window
    totals = pm.groupBy("band").agg(F.max("max_at").alias("band_max"))
    carry_w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    totals = totals.withColumn("carry", F.max("band_max").over(carry_w))
    # F.greatest skips nulls: null iff no lower price exists at all
    prefix = (
        pm.join(totals.select("band", "carry"), "band")
        .select(
            "price_cents",
            "max_at",
            F.greatest("intra_max", "carry").alias("prefix_max"),
        )
    )
    return (
        rows.join(prefix, "price_cents")
        .where(
            (F.col("p_size") == F.col("max_at"))
            & (
                F.col("prefix_max").isNull()
                | (F.col("p_size") > F.col("prefix_max"))
            )
        )
        .select("p_partkey", "price_cents", "p_size")
    )


def skyline_price_size_sql(table: str = "part") -> str:
    """DuckDB twin of :func:`skyline_price_size` — deliberately the
    OTHER algorithm: quadratic NOT-EXISTS dominance, so the two engines
    agree on the frontier through independent formulations."""
    return f"""
    WITH r AS (
      SELECT p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             p_size::BIGINT AS p_size
      FROM {table})
    SELECT t.p_partkey, t.price_cents, t.p_size
    FROM r t
    WHERE NOT EXISTS (
      SELECT 1 FROM r d
      WHERE d.price_cents <= t.price_cents
        AND d.p_size >= t.p_size
        AND (d.price_cents < t.price_cents OR d.p_size > t.p_size))
    """
