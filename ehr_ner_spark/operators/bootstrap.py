"""Deterministic integer-weight bootstrap — error bars for corpus audits
in ONE pass with NO row amplification.

The classic Poisson/multinomial bootstrap resamples the corpus B times;
materializing B replicas of a 100-TB table is a non-starter.  Here each
replica b assigns every document an integer weight
``md5_60("boot:<b>:<doc_id>") % 3`` (values {0, 1, 2}, mean 1 — the
integer-weight resampling scheme, deterministic so both engines agree),
and ALL B replica aggregates are computed as 2B conditional-sum columns
of a SINGLE map-side-combined aggregate over one corpus scan.  The
single-row result unpivots to B rows (driver-sized by construction),
each replica's mean arrives through the overflow-safe exact micro
division ``(tot DIV n) * 1e6 + ((tot % n) * 1e6) DIV n``, and the
confidence band is DEFINED as order statistics of the B replica means
(ranks via a window over B rows).

Everything is BIGINT end to end — no float discipline at all.

Reference contact: none (statistical-audit family, next to
ds_distribution_drift / ds_ks_drift: those detect change, this one puts
a confidence interval on the level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOOT_SALT = "boot"
BOOT_REPLICAS = 32
# 0-indexed order statistics of the sorted replica means for a ~95% band
BOOT_LO_RANK = 1
BOOT_HI_RANK = 30

_MU = 1_000_000


def _mean_micro_expr(tot: str, n: str) -> str:
    """Exact mean in micro units, overflow-safe for tot up to ~9e18."""
    return (
        f"CASE WHEN {n} = 0 THEN 0 ELSE "
        f"({tot} DIV {n}) * {_MU} + (({tot} % {n}) * {_MU}) DIV {n} END"
    )


def bootstrap_ci(docs: DataFrame, value_col: str = "n_chars",
                 replicas: int = BOOT_REPLICAS) -> DataFrame:
    """95% bootstrap confidence band for the corpus mean of
    ``value_col``.

    Output: one row (n_docs, mean_micro, ci_lo_micro, ci_hi_micro,
    n_replicas)."""
    from pyspark.sql import Window

    from ..hashing import md5_60_expr

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(value_col)).cast("long").alias("tot0"),
    ]
    for b in range(replicas):
        w = F.pmod(
            md5_60_expr(
                F.concat(
                    F.lit(f"{BOOT_SALT}:{b}:"), F.col("doc_id").cast("string")
                )
            ),
            F.lit(3),
        )
        aggs += [
            F.sum(w * F.col(value_col)).cast("long").alias(f"s{b}"),
            F.sum(w).cast("long").alias(f"c{b}"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(f"{b}, s{b}, c{b}" for b in range(replicas))
    means = one.select(
        "n_docs",
        F.expr(_mean_micro_expr("tot0", "n_docs")).cast("long")
        .alias("mean_micro"),
        F.expr(f"stack({replicas}, {stack_args}) AS (b, s, c)"),
    ).select(
        "n_docs",
        "mean_micro",
        F.expr(_mean_micro_expr("s", "c")).cast("long").alias("m"),
    )
    ranked = means.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.asc("m"))) - 1,
    )
    return ranked.groupBy("n_docs", "mean_micro").agg(
        F.min(F.when(F.col("rnk") == BOOT_LO_RANK, F.col("m")))
        .cast("long").alias("ci_lo_micro"),
        F.min(F.when(F.col("rnk") == BOOT_HI_RANK, F.col("m")))
        .cast("long").alias("ci_hi_micro"),
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
    )


def bootstrap_ci_sql(table: str = "documents", value_col: str = "n_chars",
                     replicas: int = BOOT_REPLICAS) -> str:
    """DuckDB twin: same weights, same single-pass conditional sums, same
    order statistics."""
    cols = ["COUNT(*)::BIGINT AS n_docs",
            f"SUM({value_col})::BIGINT AS tot0"]
    for b in range(replicas):
        h = (
            f"(('0x' || substr(md5('{BOOT_SALT}:{b}:'"
            f" || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 3)"
        )
        cols.append(f"SUM({h} * {value_col})::BIGINT AS s{b}")
        cols.append(f"SUM({h})::BIGINT AS c{b}")
    unpivot = " UNION ALL ".join(
        f"SELECT n_docs, mean_micro, s{b} AS s, c{b} AS c FROM one"
        for b in range(replicas)
    )

    def mean(tot, n):
        return (
            f"CASE WHEN {n} = 0 THEN 0 ELSE "
            f"({tot} // {n}) * {_MU} + (({tot} % {n}) * {_MU}) // {n} END"
        )

    return f"""
    WITH agg AS (SELECT {', '.join(cols)} FROM {table}),
    one AS (
      SELECT *, CAST({mean('tot0', 'n_docs')} AS BIGINT) AS mean_micro
      FROM agg),
    means AS (
      SELECT n_docs, mean_micro,
             CAST({mean('s', 'c')} AS BIGINT) AS m
      FROM ({unpivot})),
    ranked AS (
      SELECT n_docs, mean_micro, m,
             ROW_NUMBER() OVER (ORDER BY m ASC) - 1 AS rnk
      FROM means)
    SELECT n_docs, mean_micro,
           MIN(CASE WHEN rnk = {BOOT_LO_RANK} THEN m END)::BIGINT
             AS ci_lo_micro,
           MIN(CASE WHEN rnk = {BOOT_HI_RANK} THEN m END)::BIGINT
             AS ci_hi_micro,
           COUNT(*)::BIGINT AS n_replicas
    FROM ranked
    GROUP BY n_docs, mean_micro
    """
