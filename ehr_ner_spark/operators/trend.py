"""Per-entity mention trend across ingest batches: OLS slope of mention
counts over equal-width doc-id buckets — the "which entities are rising /
falling across ingest batches" monitoring query a production KG serves
after every load (reference analog: the corpus count matrices of
``dataPipeline.py``, here given a time axis).

Follows the integer-moments discipline (operators/stats.py): the dense
(entity × bucket) count grid is exact BIGINTs (zeros filled by a broadcast
cross join against the CONSTANT-size bucket dimension, so absence counts as
0 — a slope over only the attested buckets would bias every sparse entity
flat), the five OLS moments are combinable BIGINT sums, and the single
float division is snapped to the shared half-away 1e-6 grid.  Shuffle
profile: one (entity, bucket) count aggregate + one entity-keyed moment
aggregate — both map-side combined; the bucket dim is B = 8 rows at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 8

_R6 = "FLOOR(({x}) * 1e6 + 0.5) / 1e6"


def _r6(col):
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def entity_trend(mentions: DataFrame, n_buckets: int = N_BUCKETS,
                 min_total: int = 20) -> DataFrame:
    """Mentions ``(doc_id, text, ...)`` -> per-surface
    ``(text, n_total, slope, trend)`` for surfaces with at least
    ``min_total`` mentions.  Bucket = equal-width slice of the doc-id
    range (ingest order); trend = sign of the exact OLS slope."""
    spark = mentions.sparkSession
    mx = mentions.agg(F.max("doc_id").alias("max_id"))
    bucketed = (
        mentions.crossJoin(F.broadcast(mx))
        .select(
            "text",
            # integer DIV on both engines (a double-division + cast would
            # diverge: DuckDB ::BIGINT rounds, Spark cast truncates)
            F.least(
                F.expr(f"(doc_id * {n_buckets}) DIV (max_id + 1)"),
                F.lit(n_buckets - 1).cast("long"),
            ).alias("b"),
        )
        .groupBy("text", "b")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = spark.range(n_buckets).select(F.col("id").alias("b"))
    dense = (
        bucketed.select("text").distinct()
        .crossJoin(F.broadcast(grid))
        .join(bucketed, ["text", "b"], "left")
        .select("text", "b", F.coalesce("y", F.lit(0)).alias("y"))
    )
    m = dense.groupBy("text").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("b") * F.col("b")).alias("sxx"),
        F.sum(F.col("b") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - (
        F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = n * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    slope = _r6(num / den)
    trend = (
        F.when(slope > 0, F.lit("rising"))
        .when(slope < 0, F.lit("falling"))
        .otherwise(F.lit("flat"))
    )
    return (
        m.where(F.col("sy") >= min_total)
        .select(
            "text",
            F.col("sy").cast("long").alias("n_total"),
            slope.alias("slope"),
            trend.alias("trend"),
        )
    )


def entity_trend_sql(mentions_sql: str, n_buckets: int = N_BUCKETS,
                     min_total: int = 20) -> str:
    """DuckDB twin — identical bucketing, zero fill, BIGINT moments,
    snapped division and sign bands."""
    slope = _R6.format(x="num / den")
    return f"""
    WITH mentions AS ({mentions_sql}),
    mx AS (SELECT MAX(doc_id) AS max_id FROM mentions),
    bucketed AS (
      SELECT text,
             LEAST((doc_id * {n_buckets}) // (max_id + 1),
                   {n_buckets - 1}) AS b,
             COUNT(*) AS y
      FROM mentions, mx
      GROUP BY 1, 2),
    grid AS (SELECT unnest(range({n_buckets})) AS b),
    dense AS (
      SELECT t.text, g.b, COALESCE(bk.y, 0) AS y
      FROM (SELECT DISTINCT text FROM bucketed) t
      CROSS JOIN grid g
      LEFT JOIN bucketed bk ON bk.text = t.text AND bk.b = g.b),
    m AS (
      SELECT text,
             COUNT(*)::BIGINT AS n,
             SUM(b)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
             SUM(b * b)::BIGINT AS sxx, SUM(b * y)::BIGINT AS sxy
      FROM dense GROUP BY 1),
    d AS (
      SELECT text, sy,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS den
      FROM m WHERE sy >= {min_total}),
    s AS (SELECT text, sy, {slope} AS slope FROM d)
    SELECT text, sy AS n_total, slope,
           CASE WHEN slope > 0 THEN 'rising'
                WHEN slope < 0 THEN 'falling'
                ELSE 'flat' END AS trend
    FROM s
    """
