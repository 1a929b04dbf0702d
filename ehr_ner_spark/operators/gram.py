"""Distributed Gram matrix (X^T X) over the embedding table — the
linear-algebra primitive behind covariance/PCA/whitening of a 100-TB
embedding corpus.

Why this is THE shape for distributed second moments: the result is
D(D+1)/2 cells (D = 64 here -> 2,080 rows) no matter how many vectors flow
in, so ALL the work belongs map-side — each Arrow batch contributes one
BLAS rank-k update to a per-partition accumulator, each partition emits
exactly one upper-triangle frame, and the only exchange carries
2,080 x n_partitions rows of three longs.  This is the same treeAggregate
Gramian shape Spark MLlib's ``RowMatrix.computeGramianMatrix`` uses; here
it is expressed through mapInPandas + a partial/final SUM so Catalyst owns
the combine.

Determinism discipline (what makes the DuckDB twin hash-exact): embedding
entries are quantized to the shared micro-grid ``floor(x * 1e6 + 0.5)``
FIRST, and every subsequent op is integer.  The per-chunk float64 matmul
is still exact: |x| < 1 for these unit-normalized vectors, so each product
of two quantized entries is < 1e12 and a <=1024-row rank-k partial sum
stays < 2^53 — bit-exact in IEEE doubles, then accumulated in int64 across
chunks.  The oracle computes the identical integers via an
explode-self-join (its own quadratic-in-D plan — fine for a single-node
twin, and deliberately a DIFFERENT algorithm from the engine's).

Reference contact: none (the reference is a per-document NER engine);
this extends the embedding-analytics family of operators/similarity.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
MICRO = 1_000_000
# rows per exact float64 rank-k update: 1024 * (1e6)^2 < 2^53 for |x| < ~2.9
_CHUNK = 1024

GRAM_SCHEMA = "i INT, j INT, gram BIGINT"


def embedding_gram(emb: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Upper-triangle Gram matrix ``G[i, j] = sum_r k_r[i] * k_r[j]`` over
    micro-quantized embeddings ``k = floor(x * 1e6 + 0.5)``.

    Output: (i, j, gram) for 0 <= i <= j < dim — D(D+1)/2 rows total.
    Divide by 1e12 * n_rows for the raw second-moment matrix; subtract the
    mean outer product for covariance; eigendecompose driver-side for PCA
    (the D x D result is driver-sized BY CONSTRUCTION at any corpus size).
    """
    import numpy as np
    import pandas as pd

    iu0, iu1 = (a.astype("int32") for a in np.triu_indices(dim))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            K = np.floor(X * MICRO + 0.5)
            for s in range(0, K.shape[0], _CHUNK):
                blk = K[s : s + _CHUNK]
                acc += (blk.T @ blk).astype(np.int64)
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu0, "j": iu1, "gram": acc[iu0, iu1]}
            )

    parts = emb.select("embedding").mapInPandas(part, GRAM_SCHEMA)
    return parts.groupBy("i", "j").agg(F.sum("gram").alias("gram"))


def embedding_gram_sql(dim: int = EMB_DIM, table: str = "embeddings") -> str:
    """DuckDB twin: explode to (vec_id, i, k), self-join on vec_id, sum the
    integer products — same micro-grid quantization, different algorithm."""
    return f"""
    WITH kv AS (
      SELECT vec_id, CAST(u.i - 1 AS INT) AS i,
             CAST(floor(CAST(u.x AS DOUBLE) * {MICRO} + 0.5) AS BIGINT) AS k
      FROM {table},
      LATERAL (SELECT unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS i) u)
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.k * b.k) AS BIGINT) AS gram
    FROM kv a JOIN kv b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """
