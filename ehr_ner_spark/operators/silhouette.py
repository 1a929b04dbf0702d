"""Simplified (centroid-based) silhouette score per label over the
embeddings table — the cluster-quality gate for embedding-space curation
(is the labeling / clustering coherent enough to balance a data mixture
on?).  Classic silhouette is O(n²); the centroid form (a = distance to own
centroid, b = distance to the nearest OTHER centroid) is the standard
linear-time variant and is what scales: one aggregate for centroids, one
broadcast nested loop of n×L distances, one final aggregate.

Determinism discipline (kmeans.py precedent): centroids are per-(label,
dim) means snapped to the shared half-away 1e-6 grid, distances are
deterministic left-to-right JVM folds, each per-vector silhouette is
snapped to 1e-6 — and the per-label MEAN is computed over the snapped
values as an exact BIGINT sum of micro-units, so no engine-owned float
accumulation order ever reaches the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import _sqdist

_SNAP6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, c_emb): per-label mean vector, snapped per dimension.
    posexplode -> (label, dim) map-side-combined means (exactly L×D groups
    regardless of input size), reassembled with an order-fixing sort."""
    means = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(_SNAP6(F.avg(F.col("v").cast("double"))).alias("mv"))
    )
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mv"))).alias("s"))
        .select(
            "label",
            F.transform(F.col("s"), lambda x: x["mv"]).alias("c_emb"),
        )
    )


def silhouette_by_label(emb: DataFrame) -> DataFrame:
    """embeddings (vec_id, embedding, label) ->
    (label, n_vecs, mean_silhouette)."""
    cents = label_centroids(emb)
    d = (
        emb.crossJoin(
            F.broadcast(
                cents.select(
                    F.col("label").alias("c_label"), F.col("c_emb")
                )
            )
        )
        .select(
            "vec_id",
            "label",
            "c_label",
            F.sqrt(_sqdist(F.col("embedding"), F.col("c_emb"))).alias("dist"),
        )
    )
    per_vec = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("label") == F.col("c_label"), F.col("dist")))
        .alias("a"),
        F.min(F.when(F.col("label") != F.col("c_label"), F.col("dist")))
        .alias("b"),
    )
    a = F.col("a")
    b = F.col("b")
    s = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    micro = F.round(_SNAP6(s) * F.lit(1e6)).cast("long")
    return (
        per_vec.select("label", micro.alias("s_micro"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("s_micro").alias("sm"),
        )
        .select(
            "label",
            "n_vecs",
            _SNAP6(
                F.col("sm").cast("double")
                / F.lit(1e6)
                / F.col("n_vecs").cast("double")
            ).alias("mean_silhouette"),
        )
    )


def silhouette_sql() -> str:
    """DuckDB twin: same snapped centroids, same squared-L2, same exact
    micro-unit mean."""
    return """
    WITH e AS MATERIALIZED (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings),
    mean_d AS (
      SELECT label, (u.s).i - 1 AS dim,
             FLOOR(AVG((u.s).v) * 1000000 + 0.5) / 1000000 AS mv
      FROM (SELECT label,
                   unnest(list_transform(emb, (x, i) -> {'v': x, 'i': i})) AS s
            FROM e) u
      GROUP BY label, (u.s).i - 1),
    cents AS MATERIALIZED (
      SELECT label AS c_label, list(mv ORDER BY dim) AS c_emb
      FROM mean_d GROUP BY label),
    d AS (
      SELECT e.vec_id, e.label, c.c_label,
             list_distance(e.emb, c.c_emb) AS dist
      FROM e CROSS JOIN cents c),
    per_vec AS (
      SELECT vec_id, label,
             MIN(CASE WHEN label = c_label THEN dist END) AS a,
             MIN(CASE WHEN label <> c_label THEN dist END) AS b
      FROM d GROUP BY vec_id, label),
    s AS (
      SELECT label,
             ROUND(FLOOR((CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                          ELSE (b - a) / GREATEST(a, b) END)
                         * 1000000 + 0.5) / 1000000 * 1000000)::BIGINT
               AS s_micro
      FROM per_vec)
    SELECT label,
           COUNT(*)::BIGINT AS n_vecs,
           FLOOR(SUM(s_micro)::DOUBLE / 1000000 / COUNT(*)::DOUBLE
                 * 1000000 + 0.5) / 1000000 AS mean_silhouette
    FROM s GROUP BY label
    """
