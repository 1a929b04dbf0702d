"""Z-order (Morton-curve) data layout for multi-dimensional pruning —
the storage-layout operator behind Delta/Iceberg ``OPTIMIZE ZORDER BY``:
interleave the bits of two clustering keys so that files written in
z-value ranges carry TIGHT min/max statistics on BOTH dimensions, and a
2-D predicate box prunes most files instead of (as with a linear sort on
one key) only along the sorted dimension.

Spark-first shape, 100-TB story: the z-value is a pure integer column
expression (32 bit-extract terms, whole-stage codegen — no UDF), the
file bucket is a prefix of the z-value (``z div 2^18`` -> <=1024
buckets), and the per-bucket statistics frame is ONE map-side-combined
aggregation whose shuffle carries one row per bucket.  At real scale
the same expression feeds ``df.repartitionByRange(F.col("z"))
.sortWithinPartitions("z").write...``, which is exactly how engines
implement OPTIMIZE ZORDER; the stats frame emitted here IS the footer
min/max a reader would prune on, so ``probe_overlaps`` measures the
layout's pruning power directly: the probe box scans only the buckets
with probe_overlaps = 1.

Bit interleaving is expressed with div/mod/multiply only (no shift
operators), so the Spark column tree and the DuckDB twin are the same
integer arithmetic; every output is a BIGINT — no float discipline at
all.

Reference contact: none (storage-layout family; the engine-side
complement of io/icetable.py's snapshot layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 14                     # o_custkey <= 14999, epoch-day <= 11535
BUCKET_SHIFT = 18               # z < 2^28 -> <=1024 buckets
# probe predicate box: custkey BETWEEN 4000 AND 5000,
#                      orderdate epoch-day BETWEEN 10000 AND 10400
PROBE = {"x_lo": 4000, "x_hi": 5000, "y_lo": 10000, "y_hi": 10400}

_MASK = (1 << Z_BITS) - 1


def _interleave_sql(x: str, y: str, intdiv: str) -> str:
    """Morton interleave of the low Z_BITS of `x` (even bit lanes) and
    `y` (odd lanes) as pure div/mod/mul arithmetic; `intdiv` is the
    engine's integer-division operator ('div' or '//')."""
    terms = []
    for i in range(Z_BITS):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append(f"(({x} {intdiv} {p2}) % 2) * {p4}")
        terms.append(f"(({y} {intdiv} {p2}) % 2) * {2 * p4}")
    return " + ".join(terms)


def zorder_layout(orders: DataFrame) -> DataFrame:
    """orders -> per-z-bucket layout statistics: (bucket, n_rows,
    x_min, x_max, y_min, y_max, probe_overlaps) where x = o_custkey,
    y = epoch-day(o_orderdate) and probe_overlaps says whether a reader
    scanning PROBE's 2-D box could skip the bucket on footer stats."""
    x = f"(o_custkey % {_MASK + 1})"
    y = f"(datediff(to_date(o_orderdate), DATE '1970-01-01') % {_MASK + 1})"
    z = _interleave_sql(x, y, "div")
    keyed = orders.select(
        F.expr(x).cast("long").alias("x"),
        F.expr(y).cast("long").alias("y"),
        F.expr(f"({z}) div {1 << BUCKET_SHIFT}").cast("long")
        .alias("bucket"),
    )
    p = PROBE
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .select(
            "bucket", "n_rows", "x_min", "x_max", "y_min", "y_max",
            (
                (F.col("x_min") <= F.lit(p["x_hi"]))
                & (F.col("x_max") >= F.lit(p["x_lo"]))
                & (F.col("y_min") <= F.lit(p["y_hi"]))
                & (F.col("y_max") >= F.lit(p["y_lo"]))
            ).cast("long").alias("probe_overlaps"),
        )
    )


def zorder_layout_sql() -> str:
    """DuckDB twin: identical interleave arithmetic and probe box."""
    x = f"(o_custkey % {_MASK + 1})"
    y = (
        "(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) "
        f"% {_MASK + 1})"
    )
    z = _interleave_sql(x, y, "//")
    p = PROBE
    return f"""
    WITH keyed AS (
      SELECT {x}::BIGINT AS x, {y}::BIGINT AS y,
             (({z}) // {1 << BUCKET_SHIFT})::BIGINT AS bucket
      FROM orders),
    stats AS (
      SELECT bucket, COUNT(*) AS n_rows,
             MIN(x) AS x_min, MAX(x) AS x_max,
             MIN(y) AS y_min, MAX(y) AS y_max
      FROM keyed GROUP BY bucket)
    SELECT bucket, n_rows, x_min, x_max, y_min, y_max,
           (x_min <= {p["x_hi"]} AND x_max >= {p["x_lo"]}
            AND y_min <= {p["y_hi"]} AND y_max >= {p["y_lo"]})::BIGINT
             AS probe_overlaps
    FROM stats
    """
