"""Principal-component analysis over the distributed Gram matrix — power
iteration for the dominant eigenvector, plus exact integer projections of
every embedding onto the resulting axis (the "extreme documents along the
corpus's main direction" curation view).

Spark-first shape: the heavy lifting — reducing a 100-TB embedding corpus
to the D x D second-moment matrix — is :func:`..gram.embedding_gram`
(map-side BLAS rank-k updates, one tiny exchange).  Everything here runs
on frames bounded by D^2 = 4,096 rows regardless of corpus size: each
power-iteration round is ONE equi-join of the D-row vector onto the
persisted full Gram plus a map-side-combined SUM, and the max-norm
normalizer arrives by broadcast.  The projection pass is map-only — the
D-row eigenvector broadcasts onto the exploded embedding stream and the
per-vector dot product is an order-free BIGINT sum of bounded integer
products (micro-grid x micro-grid x D < 2^53), finished by a distributed
TakeOrdered.

Oracle exactness: the iteration follows the kmeans/pagerank snap
discipline — the vector re-snaps to the shared ``floor(x*1e9 + 0.5)/1e9``
grid after every normalization, so the ~1e-14 relative summation-order
noise of the matvec cannot walk the engine and the unrolled-CTE DuckDB
twin apart (the matvec inputs are exact: Gram cells are BIGINTs and both
engines cast the SAME integers to correctly-rounded doubles).  The
eigenvalue is reported in units of 1e3 (``floor(mx / 1e3 + 0.5)``) —
grid 1e3 against absolute noise ~1e-1 at the observed magnitudes.  The
projections are pure BIGINT arithmetic on the snapped axis: no float
discipline at all.

Reference contact: none (embedding-analytics family; composes with
operators/gram.py and the similarity/ANN stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gram import EMB_DIM, MICRO, embedding_gram, embedding_gram_sql

PCA_ITERS = 4
PCA_TOPK = 20
_SNAP = 1_000_000_000


def _snap9(col):
    return F.floor(col * F.lit(float(_SNAP)) + F.lit(0.5)) / F.lit(float(_SNAP))


def _power_vector(emb: DataFrame, dim: int, iters: int,
                  checkpoint: bool = True):
    """(v frame (dim, v), mx frame (mx)) after ``iters`` max-norm power
    iteration rounds from the all-ones start vector.

    Each round's matvec feeds BOTH the normalizer and the next vector —
    the same two-consumer fan-out as paths.py's BFS, so without per-round
    lineage truncation the tiny D-row plan re-executes 2^iters times.
    ``localCheckpoint`` flattens each round to a leaf (the frame is <= D
    rows; the corpus-scale work is behind the persisted Gram anyway).
    ``checkpoint=False`` lets plan tests inspect the declarative round."""
    from ..cache import tracked_persist

    _ckpt = ((lambda df: df.localCheckpoint(eager=True)) if checkpoint
             else (lambda df: df))
    g = embedding_gram(emb, dim)
    full = tracked_persist(
        g.select("i", "j", "gram").unionByName(
            g.filter(F.col("i") < F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "gram"
            )
        )
    )
    v = full.select(F.col("i").alias("dim")).distinct().select(
        "dim", F.lit(1.0).alias("v")
    )
    mx = None
    for _ in range(iters):
        w = _ckpt(
            full.join(v, full["j"] == v["dim"])
            .groupBy(full["i"].alias("dim"))
            .agg(
                F.sum(F.col("gram").cast("double") * F.col("v")).alias("w")
            )
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.crossJoin(F.broadcast(mx)).select(
            "dim",
            F.when(F.col("mx") == 0.0, F.lit(0.0))
            .otherwise(_snap9(F.col("w") / F.col("mx")))
            .alias("v"),
        )
    return v, mx


def pca_power(emb: DataFrame, dim: int = EMB_DIM,
              iters: int = PCA_ITERS,
              checkpoint: bool = True) -> DataFrame:
    """Dominant eigenvector of the embedding Gram matrix by max-norm power
    iteration.  Output: (dim, v_mu, eigenvalue_kilo) — the axis on the
    1e-6 grid plus the max-norm eigenvalue estimate in units of 1e3."""
    v, mx = _power_vector(emb, dim, iters, checkpoint=checkpoint)
    lam = mx.select(
        F.floor(F.col("mx") / F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("eigenvalue_kilo")
    )
    return v.crossJoin(F.broadcast(lam)).select(
        "dim",
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("v_mu"),
        "eigenvalue_kilo",
    )


def pca_outliers(emb: DataFrame, dim: int = EMB_DIM,
                 iters: int = PCA_ITERS,
                 topk: int = PCA_TOPK,
                 checkpoint: bool = True) -> DataFrame:
    """Top-``topk`` vectors by |projection| onto the dominant axis — the
    most extreme documents along the corpus's main direction.  The dot
    product is an order-free BIGINT sum of micro-grid products (each
    |term| < 1e12, D = 64 terms -> |sum| < 2^53): exact on both engines.

    Output: (vec_id, label, proj_q) ordered by (|proj_q| DESC, vec_id
    ASC); ``proj_q`` is in micro^2 units of the max-norm axis."""
    v, _ = _power_vector(emb, dim, iters, checkpoint=checkpoint)
    axis = v.select(
        "dim",
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("v_mu"),
    )
    kv = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * F.lit(float(MICRO)) + F.lit(0.5))
        .cast("long")
        .alias("k"),
    )
    proj = (
        kv.join(F.broadcast(axis), "dim")
        .groupBy("vec_id")
        .agg(
            F.min("label").alias("label"),
            F.sum(F.col("k") * F.col("v_mu")).cast("long").alias("proj_q"),
        )
    )
    return (
        proj.orderBy(F.abs(F.col("proj_q")).desc(), F.col("vec_id").asc())
        .limit(topk)
        .select("vec_id", "label", "proj_q")
    )


def _power_ctes(dim: int, iters: int, table: str) -> str:
    """Shared CTE chain: gram -> full -> unrolled iteration rounds."""
    parts = [f"""
    WITH gram AS ({embedding_gram_sql(dim, table)}),
    gfull AS (
      SELECT i, j, gram FROM gram
      UNION ALL
      SELECT j AS i, i AS j, gram FROM gram WHERE i < j),
    v0 AS (SELECT DISTINCT i AS dim, 1.0 AS v FROM gfull)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
    w{t} AS (
      SELECT f.i AS dim, SUM(CAST(f.gram AS DOUBLE) * v.v) AS w
      FROM gfull f JOIN v{t - 1} v ON f.j = v.dim GROUP BY f.i),
    m{t} AS (SELECT MAX(ABS(w)) AS mx FROM w{t}),
    v{t} AS (
      SELECT dim,
             CASE WHEN mx = 0.0 THEN 0.0
                  ELSE FLOOR(w / mx * {float(_SNAP)} + 0.5) / {float(_SNAP)}
             END AS v
      FROM w{t} CROSS JOIN m{t})""")
    return "".join(parts)


def pca_power_sql(dim: int = EMB_DIM, iters: int = PCA_ITERS,
                  table: str = "embeddings") -> str:
    """DuckDB twin: identical quantization, snap grid and iteration
    count, unrolled as CTEs."""
    return f"""{_power_ctes(dim, iters, table)}
    SELECT dim,
           CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS v_mu,
           CAST(FLOOR(mx / 1000.0 + 0.5) AS BIGINT) AS eigenvalue_kilo
    FROM v{iters} CROSS JOIN m{iters}
    """


def pca_outliers_sql(dim: int = EMB_DIM, iters: int = PCA_ITERS,
                     topk: int = PCA_TOPK,
                     table: str = "embeddings") -> str:
    """DuckDB twin of the projection pass — same BIGINT dot products."""
    return f"""{_power_ctes(dim, iters, table)},
    axis AS (
      SELECT dim, CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT) AS v_mu
      FROM v{iters}),
    kv AS (
      SELECT vec_id, label, CAST(u.i - 1 AS INT) AS dim,
             CAST(FLOOR(CAST(u.x AS DOUBLE) * {MICRO} + 0.5) AS BIGINT) AS k
      FROM {table},
      LATERAL (SELECT unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS i) u),
    proj AS (
      SELECT kv.vec_id, MIN(kv.label) AS label,
             SUM(kv.k * a.v_mu)::BIGINT AS proj_q
      FROM kv JOIN axis a USING (dim)
      GROUP BY kv.vec_id)
    SELECT vec_id, label, proj_q FROM proj
    ORDER BY ABS(proj_q) DESC, vec_id ASC
    LIMIT {topk}
    """
