"""Functional-dependency audit — the data-quality gate a pipeline runs
before trusting a column as a join/canonicalization key: for each
candidate FD ``X -> Y``, measure how badly the data violates it.

Per FD the audit reports the g3 error (Kivinen & Mannila: the minimum
fraction of rows to delete so the FD holds exactly — computed as
``1 - sum over keys of max same-Y group size / n_rows``), plus the raw
key / violating-key / violating-row counts.

Spark-first shape, 100-TB story: each FD is TWO map-side-combined
aggregations — counts by (X, Y), then per-X roll-up (sum, max, distinct-Y
count arrives free as COUNT(*) of the (X, Y) groups) — and one global
single-row reduce.  The shuffle carries the (X, Y) group frame, never raw
rows; skewed X keys only imbalance the second (already-reduced) stage.
Everything is a BIGINT until the final g3 division, snapped to the shared
1e-6 half-away grid, so the DuckDB twin is exact.

Reference contact: none (data-quality family; the audit complements the
canonical-key election of operators/linking.py, which assumes
surface -> canonical is functional).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (label, table, X, Y) — the three audited dependencies: one that holds
# by construction (unique key), two genuinely violated behavioural FDs.
FDS = [
    ("customer.c_custkey->c_mktsegment", "customer",
     "c_custkey", "c_mktsegment"),
    ("orders.o_custkey->o_orderpriority", "orders",
     "o_custkey", "o_orderpriority"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
]


def _audit_one(df: DataFrame, label: str, x: str, y: str) -> DataFrame:
    groups = df.groupBy(
        F.col(x).alias("_x"), F.col(y).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_key = groups.groupBy("_x").agg(
        F.sum("_n").alias("_rows"),
        F.max("_n").alias("_max"),
        F.count(F.lit(1)).alias("_ny"),
    )
    return per_key.agg(
        F.lit(label).alias("fd"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("_ny") > 1).cast("long")).alias("n_violating_keys"),
        F.sum("_rows").alias("n_rows"),
        F.sum(F.col("_rows") - F.col("_max")).alias("n_violating_rows"),
        (
            F.floor(
                F.sum(F.col("_rows") - F.col("_max")).cast("double")
                / F.sum("_rows") * F.lit(1000000.0) + F.lit(0.5)
            ) / F.lit(1000000.0)
        ).alias("g3_error"),
    )


def fd_violations(tables: dict) -> DataFrame:
    """{table_name: DataFrame} -> one audit row per FD in FDS."""
    parts = [
        _audit_one(tables[t], label, x, y) for label, t, x, y in FDS
    ]
    return reduce(DataFrame.unionByName, parts)


def fd_violations_sql() -> str:
    """DuckDB twin: same two-level aggregation per FD, UNION ALL."""
    parts = []
    for label, t, x, y in FDS:
        parts.append(f"""
    SELECT '{label}' AS fd,
           COUNT(*) AS n_keys,
           SUM((_ny > 1)::BIGINT)::BIGINT AS n_violating_keys,
           SUM(_rows)::BIGINT AS n_rows,
           SUM(_rows - _max)::BIGINT AS n_violating_rows,
           FLOOR(SUM(_rows - _max)::DOUBLE / SUM(_rows)
                 * 1000000.0 + 0.5) / 1000000.0 AS g3_error
    FROM (
      SELECT _x, SUM(_n) AS _rows, MAX(_n) AS _max, COUNT(*) AS _ny
      FROM (SELECT {x} AS _x, {y} AS _y, COUNT(*) AS _n
            FROM {t} GROUP BY 1, 2)
      GROUP BY _x)""")
    return " UNION ALL ".join(parts)
