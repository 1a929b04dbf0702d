"""ANALYZE-TABLE-grade column statistics — the numbers a cost-based
optimizer (and a lakehouse table maintenance job) actually consumes:
exact row count, per-column exact NDV, null count, min/max, and average
rendered width.

Spark-first shape: ONE aggregate computes every statistic for every
audited column in a single corpus pass — counts/min/max/total-width all
combine map-side, and the exact ``count(DISTINCT col)`` set is what
Catalyst expands into its internal EXPAND + two-phase aggregate (the
standard exact-NDV cost; the cheap sketch path is the engine's
ds_hll_distinct sibling).  The single-row result then unpivots to one
row per column with ``stack`` — driver-sized by construction.

Cross-engine exactness: audited columns are integer / string / date
only, min/max are rendered through CAST(... AS VARCHAR) (dates print
ISO-8601 identically on both engines), and the average width is an
exact integer division in micro units via the overflow-safe split
``(tot DIV n) * 1e6 + ((tot % n) * 1e6) DIV n`` — no doubles anywhere.

Reference contact: none (lakehouse-maintenance family, next to
rel_compaction_plan / rel_zorder_layout / ds_shard_manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column, type-class) — integer / date / string columns of lineitem;
# doubles are deliberately excluded (engine-specific decimal rendering)
STAT_COLS = [
    ("l_orderkey", "int"),
    ("l_shipdate", "date"),
    ("l_returnflag", "string"),
    ("l_linestatus", "string"),
]

_MU = 1_000_000


def _avg_width_micro(tot, n):
    """Exact average width in micro units without int64 overflow:
    (tot DIV n) * 1e6 + ((tot MOD n) * 1e6) DIV n."""
    return (
        F.expr(f"({tot} DIV {n}) * {_MU} + (({tot} % {n}) * {_MU}) DIV {n}")
        .cast("long")
    )


def column_stats(df: DataFrame) -> DataFrame:
    """One row per audited column:
    (column, n_rows, n_null, ndv, min_v, max_v, avg_width_micro)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c, _t in STAT_COLS:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__ndv"),
            # min/max over the NATIVE type (numeric/date order, what a
            # CBO needs), rendered to varchar only afterwards
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            F.sum(F.coalesce(F.length(s), F.lit(0)))
            .cast("long").alias(f"{c}__len"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__ndv, {c}__min, {c}__max, {c}__len"
        for c, _t in STAT_COLS
    )
    long_f = one.select(
        "n_rows",
        F.expr(
            f"stack({len(STAT_COLS)}, {stack_args}) AS "
            "(column, n_null, ndv, min_v, max_v, tot_len)"
        ),
    )
    return long_f.select(
        "column",
        "n_rows",
        "n_null",
        "ndv",
        "min_v",
        "max_v",
        F.when(F.col("n_rows") - F.col("n_null") == 0, F.lit(0))
        .otherwise(_avg_width_micro("tot_len", "(n_rows - n_null)"))
        .cast("long")
        .alias("avg_width_micro"),
    )


def column_stats_sql(table: str = "lineitem") -> str:
    """DuckDB twin: same single-pass aggregate, UNION-ALL unpivot, ISO
    varchar rendering and overflow-safe micro division."""
    parts = []
    for c, _t in STAT_COLS:
        parts.append(f"""
    SELECT '{c}' AS "column",
           COUNT(*)::BIGINT AS n_rows,
           SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           COUNT(DISTINCT {c})::BIGINT AS ndv,
           CAST(MIN({c}) AS VARCHAR) AS min_v,
           CAST(MAX({c}) AS VARCHAR) AS max_v,
           CASE WHEN COUNT({c}) = 0 THEN 0
                ELSE (SUM(length(CAST({c} AS VARCHAR))) // COUNT({c}))
                       * {_MU}
                     + ((SUM(length(CAST({c} AS VARCHAR))) % COUNT({c}))
                       * {_MU}) // COUNT({c})
           END::BIGINT AS avg_width_micro
    FROM {table}""")
    return " UNION ALL ".join(parts)
