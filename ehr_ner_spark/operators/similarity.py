"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the (small) query set,
  JVM-side dot product via zip_with/aggregate (no Python in the hot path),
  per-query window top-k.  The baseline the ANN path is measured against.
* lsh_ann_topk     — random-hyperplane sign-LSH bucketing: queries only score
  candidates sharing a bucket (multi-probe via several independent tables),
  then exact rerank.  The 100-TB path: candidate generation is a bucket
  equi-join instead of a full cross product.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DIM = 64
# The driver's synthetic embeddings are isotropic (top-5 neighbor cosine
# ~0.32, i.e. theta/pi ~ 0.39 — LSH's worst case).  5 planes x 12 tables
# gives ~0.64 expected recall@5 there with ~2.7x candidate pruning; on real
# clustered embeddings the same table count yields far higher recall, and
# bucket width should scale with corpus size via n_planes.
_N_PLANES = 5
_N_TABLES = 12
_rng = np.random.RandomState(777)
_PLANES = [_rng.standard_normal((_N_PLANES, _DIM)) for _ in range(_N_TABLES)]


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (excluding self).
    Output: (query_id, rank, vec_id, score)."""
    q = embeddings.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id", "vec_id", _cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 3).alias("score"))
    )


def _bucket_expr(emb_col, table_idx: int):
    """Sign-LSH bucket id: sum of bit(i) * 2^i, all JVM-side arithmetic."""
    plane = _PLANES[table_idx]
    terms = []
    for i in range(_N_PLANES):
        dot = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(float(w)) for w in plane[i]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        terms.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    return bucket


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """(vec_id, table, bucket) — multi-table sign-LSH index."""
    return embeddings.select(
        "vec_id", "embedding",
        F.posexplode(
            F.array(*[_bucket_expr(F.col("embedding"), t) for t in range(_N_TABLES)])
        ).alias("table", "bucket"),
    )


def lsh_ann_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any (table, bucket)
    with the query; exact cosine rerank on candidates only."""
    idx = lsh_buckets(embeddings)
    q = idx.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "table", "bucket",
    )
    cand = (
        idx.join(F.broadcast(q), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", _cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 3).alias("score"))
    )
