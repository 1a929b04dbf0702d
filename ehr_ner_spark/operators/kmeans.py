"""Distributed k-means over the embeddings table (Lloyd's algorithm) — the
topic/quality clustering stage of a training-data curation pipeline (data
mixing, cluster-balanced sampling, outlier pruning).

Spark-first shape — the second iterative-ML operator alongside the U7
trainer (operators/train.py), same broadcast-parameter pattern MLlib's
KMeans uses:

* **Assignment is a broadcast nested loop**: k x dim doubles (independent
  of corpus size) cross-joined onto the vectors; squared-L2 evaluated as a
  deterministic left-to-right JVM fold (``F.aggregate(zip_with(...))`` —
  no Python, whole-stage codegen), argmin via one window over k rows per
  vector.
* **Re-estimation is a map-side-combined aggregate** over (cluster, dim)
  keys — exactly k*dim groups regardless of input size, so the shuffle
  carries kilobytes at any scale.
* **Driver round-trip per iteration is O(k*dim)**: collect the per-dim
  means, snap, broadcast the next centroid set.

Oracle exactness: new centroids are snapped each round with the repo's
shared half-away grid (``floor(x*1e6 + 0.5)/1e6`` — the same FUNCTION the
DuckDB twin applies, similarity.py precedent), so float-summation-order
noise in the per-dim means (~1e-13) cannot walk the two sides apart across
iterations; assignment argmin is stable because exact centroid ties are
measure-zero for real-valued embeddings.  Per-cluster inertia is rounded
half-away to 3 decimals on both sides.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_CLUSTERS = 8
KM_ITERS = 2


def _snap6(x: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5)/1e6 — identical on both sides (see
    similarity.round_half_away_3 for why np.round/SQL ROUND disagree)."""
    return np.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _sqdist(a, b):
    """Deterministic left-to-right squared-L2 fold (JVM built-ins)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(e: DataFrame, cents_df: DataFrame) -> DataFrame:
    """(vec_id, embedding, cluster, d2): nearest centroid per vector,
    ties -> min cent_id (the oracle's ORDER BY d, cent_id twin)."""
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cent_id"))
    return (
        e.crossJoin(F.broadcast(cents_df))
        .select(
            "vec_id", "embedding", "cent_id",
            _sqdist(F.col("embedding"), F.col("c_emb")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cluster"), "d2")
    )


def kmeans_clusters(
    embeddings: DataFrame, k: int = K_CLUSTERS, iters: int = KM_ITERS
) -> DataFrame:
    """embeddings (vec_id, embedding) -> (cluster, n_points, inertia).

    Deterministic init: the k smallest vec_ids' embeddings (like
    ivf_assign's stride seeding — the iteration, not the seeding, is the
    operator).  ``iters`` Lloyd rounds, then a final assignment under the
    last snapped centroid set."""
    from ..cache import tracked_persist

    spark = embeddings.sparkSession
    # iters + 2 actions consume this projection (init, per-round assign +
    # means, final assignment) — stage it once, like the trainer's frame
    e = tracked_persist(embeddings.select("vec_id", "embedding"))

    init = e.orderBy("vec_id").limit(k).collect()
    cents: List[Tuple[int, List[float]]] = [
        (i, [float(v) for v in r.embedding]) for i, r in enumerate(init)
    ]

    for _ in range(iters):
        cents_df = spark.createDataFrame(
            cents, "cent_id int, c_emb array<double>"
        )
        assigned = _assign(e, cents_df)
        means = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("mv"))
            .collect()
        )
        by_cluster: dict = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["mv"]
        nxt: List[Tuple[int, List[float]]] = []
        for cid, old in cents:
            if cid in by_cluster:  # empty cluster keeps its old centroid
                d = by_cluster[cid]
                vec = _snap6(np.array([d[i] for i in range(len(old))]))
                nxt.append((cid, [float(v) for v in vec]))
            else:
                nxt.append((cid, old))
        cents = nxt

    final_cents = spark.createDataFrame(cents, "cent_id int, c_emb array<double>")
    return (
        _assign(e, final_cents)
        .groupBy("cluster")
        .agg(
            F.count("vec_id").alias("n_points"),
            (F.floor(F.sum("d2") * 1000.0 + F.lit(0.5)) / 1000.0).alias("inertia"),
        )
        .select("cluster", "n_points", "inertia")
    )


def kmeans_oracle_sql(k: int = K_CLUSTERS, iters: int = KM_ITERS) -> str:
    """DuckDB twin: the same Lloyd rounds unrolled as CTEs (cents0 ->
    ass1 -> cents1 -> ... -> final assignment), argmin via
    ``list_distance`` (monotone with the engine's squared fold), means
    snapped with the shared floor(x*1e6 + 0.5)/1e6 grid."""
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    cents0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, emb AS c_emb
      FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {k}))"""]
    for it in range(1, iters + 1):
        parts.append(f""",
    ass{it} AS MATERIALIZED (
      SELECT vec_id, emb, cent_id AS cluster, d2 FROM (
        SELECT e.vec_id, e.emb, c.cent_id,
               list_distance(e.emb, c.c_emb) ** 2 AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.emb, c.c_emb),
                                           c.cent_id) AS rn
        FROM e CROSS JOIN cents{it - 1} c) WHERE rn = 1),
    mean{it} AS (
      SELECT cluster, (u.s).i - 1 AS dim,
             FLOOR(AVG((u.s).v) * 1000000 + 0.5) / 1000000 AS mv
      FROM (SELECT cluster,
                   unnest(list_transform(emb, (x, i) -> {{'v': x, 'i': i}})) AS s
            FROM ass{it}) u
      GROUP BY cluster, (u.s).i - 1),
    newc{it} AS (
      SELECT cluster AS cent_id, list(mv ORDER BY dim) AS c_emb
      FROM mean{it} GROUP BY cluster),
    cents{it} AS MATERIALIZED (
      SELECT p.cent_id, COALESCE(n.c_emb, p.c_emb) AS c_emb
      FROM cents{it - 1} p LEFT JOIN newc{it} n ON n.cent_id = p.cent_id)""")
    parts.append(f""",
    final AS (
      SELECT vec_id, cent_id AS cluster, d2 FROM (
        SELECT e.vec_id, c.cent_id,
               list_distance(e.emb, c.c_emb) ** 2 AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.emb, c.c_emb),
                                           c.cent_id) AS rn
        FROM e CROSS JOIN cents{iters} c) WHERE rn = 1)
    SELECT cluster, COUNT(vec_id) AS n_points,
           FLOOR(SUM(d2) * 1000 + 0.5) / 1000 AS inertia
    FROM final GROUP BY cluster""")
    return "".join(parts)
