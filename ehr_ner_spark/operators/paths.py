"""Landmark shortest paths over the entity co-occurrence graph: bounded
multi-source BFS from the highest-degree entities — the distance feature a
KG consumer uses for multi-hop reasoning ("how far is this drug from the
hub disease cluster?") and the standard landmark trick for approximating
all-pairs distances at scale (store D(landmark, v) instead of D(u, v)).

Spark-first shape — fully declarative synchronous BFS with a fixed round
count and per-round lineage truncation (same discipline as
communities.py's LPA / k-core — one bounded localCheckpoint sync per
round buys exactly-once execution and an O(hops) plan):

* landmarks are the top-L entities by (degree DESC, name ASC) via
  orderBy+limit (TakeOrderedAndProject heaps);
* each round is ONE equi-join of the distance frame onto the doubled edge
  frame + a map-side-combined MIN — shuffle O(edges * L) per round, and
  the distance frame is bounded by nodes * L at any scale;
* everything is integer distances and string keys — the unrolled-CTE
  DuckDB twin is bit-exact with no float discipline at all.

Reference contact: none (corpus-level graph analytics); extension in the
family of operators/communities.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PATHS_LANDMARKS = 4
PATHS_HOPS = 3


def landmark_paths(edges: DataFrame, n_landmarks: int = PATHS_LANDMARKS,
                   hops: int = PATHS_HOPS,
                   checkpoint: bool = True) -> DataFrame:
    """Undirected distinct (ent_a < ent_b) edges ->
    (landmark, entity, dist) for every entity within ``hops`` of one of
    the ``n_landmarks`` highest-degree landmarks.

    ``checkpoint=False`` skips the per-round lineage truncation so plan
    tests can inspect the declarative round body."""
    from ..cache import tracked_persist

    _ckpt = ((lambda df: df.localCheckpoint(eager=True)) if checkpoint
             else (lambda df: df))

    edges = edges.select("ent_a", "ent_b")
    bidir = tracked_persist(
        edges.select(F.col("ent_a").alias("src"), F.col("ent_b").alias("dst"))
        .unionByName(
            edges.select(F.col("ent_b").alias("src"),
                         F.col("ent_a").alias("dst"))
        )
    )
    deg = (
        bidir.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    landmarks = (
        deg.orderBy(F.desc("deg"), F.asc("node"))
        .limit(n_landmarks)
        .select(F.col("node").alias("landmark"))
    )
    dist = landmarks.select(
        "landmark", F.col("landmark").alias("node"), F.lit(0).alias("dist")
    )
    # dist feeds BOTH the expansion join and the union each round — without
    # per-round lineage truncation the plan doubles every hop (2^hops
    # re-executions of round 1).  localCheckpoint flattens each round to a
    # leaf; the frame is <= nodes x L rows and hops is a fixed constant.
    for _ in range(hops):
        dist = _ckpt(dist)
        nxt = (
            dist.join(bidir, dist["node"] == bidir["src"])
            .select("landmark", F.col("dst").alias("node"),
                    (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("landmark", "node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select("landmark", F.col("node").alias("entity"),
                       F.col("dist").cast("long").alias("dist"))


def landmark_paths_sql(mentions_sql: str, min_pair: int = 2,
                       n_landmarks: int = PATHS_LANDMARKS,
                       hops: int = PATHS_HOPS) -> str:
    """DuckDB twin: same edges, same landmark pick, BFS rounds unrolled as
    materialized CTEs with the identical MIN fold."""
    from .graph_sql import edges_prelude

    parts = [edges_prelude(mentions_sql, min_pair), f""",
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM bidir GROUP BY src),
    landmarks AS MATERIALIZED (
      SELECT node AS landmark FROM deg
      ORDER BY deg DESC, node ASC LIMIT {n_landmarks}),
    d0 AS MATERIALIZED (
      SELECT landmark, landmark AS node, 0 AS dist FROM landmarks)"""]
    for t in range(1, hops + 1):
        parts.append(f""",
    d{t} AS MATERIALIZED (
      SELECT landmark, node, MIN(dist) AS dist FROM (
        SELECT landmark, node, dist FROM d{t - 1}
        UNION ALL
        SELECT d.landmark, e.dst AS node, d.dist + 1 AS dist
        FROM d{t - 1} d JOIN bidir e ON e.src = d.node)
      GROUP BY landmark, node)""")
    parts.append(f"""
    SELECT landmark, node AS entity, dist::BIGINT AS dist FROM d{hops}""")
    return "".join(parts)


def harmonic_closeness(edges: DataFrame,
                       n_landmarks: int = PATHS_LANDMARKS,
                       hops: int = PATHS_HOPS,
                       checkpoint: bool = True) -> DataFrame:
    """Harmonic closeness centrality of the landmark hubs — the bounded-
    radius form of Marchiori-Latora harmonic centrality (the closeness
    variant that stays well-defined on disconnected graphs): for each
    landmark, ``sum over reached v != l of 1/dist(l, v)`` with the
    unreachable tail contributing zero.

    Integer-exact by definition: the reciprocal is DEFINED in micro units
    as ``1000000 DIV dist`` (dist is a small positive integer), so the sum
    is an order-free BIGINT fold and the twin needs no float discipline.
    The aggregate runs on the nodes x L distance frame landmark_paths
    already bounds; one map-side-combined groupBy(landmark).

    Output: (landmark, n_reached, sum_dist, harmonic_micro) ordered by
    the registry's canonical column sort downstream; rank by
    harmonic_micro DESC for the hub league table.
    """
    d = landmark_paths(edges, n_landmarks, hops, checkpoint=checkpoint)
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("landmark")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.sum(F.expr("1000000 DIV dist")).cast("long")
            .alias("harmonic_micro"),
        )
    )


def harmonic_closeness_sql(mentions_sql: str, min_pair: int = 2,
                           n_landmarks: int = PATHS_LANDMARKS,
                           hops: int = PATHS_HOPS) -> str:
    """DuckDB twin: the landmark-paths CTE chain + the same integer fold."""
    inner = landmark_paths_sql(mentions_sql, min_pair, n_landmarks, hops)
    return f"""
    SELECT landmark,
           COUNT(*)::BIGINT AS n_reached,
           SUM(dist)::BIGINT AS sum_dist,
           SUM(1000000 // dist)::BIGINT AS harmonic_micro
    FROM ({inner}) p
    WHERE dist > 0
    GROUP BY landmark
    """


def _bfs_sigma(edges: DataFrame, n_landmarks: int, hops: int,
               checkpoint: bool = True) -> DataFrame:
    """Level-synchronous BFS WITH shortest-path counting from
    ``n_landmarks`` HASH-UNIFORM sources: (landmark, node, dist, sigma)
    where sigma = number of distinct geodesics landmark->node.  Sources
    are the first L nodes in md5-60 order — the deterministic form of
    the uniform source sampling the sampled-centrality literature
    (Eppstein-Wang; Brandes-Pich) prescribes; top-DEGREE sources would
    be useless here because co-occurrence hubs form a clique (every pair
    at distance 1 -> no interior vertices).  Per round: one equi-join of
    the frontier onto the doubled edges, one map-side SUM of path counts
    per (landmark, node), one anti-join against the reached set — all
    integers, same lineage-truncation discipline as landmark_paths."""
    from ..hashing import md5_60_expr
    from ..cache import tracked_persist

    _ckpt = ((lambda df: df.localCheckpoint(eager=True)) if checkpoint
             else (lambda df: df))
    edges = edges.select("ent_a", "ent_b")
    bidir = tracked_persist(
        edges.select(F.col("ent_a").alias("src"), F.col("ent_b").alias("dst"))
        .unionByName(
            edges.select(F.col("ent_b").alias("src"),
                         F.col("ent_a").alias("dst"))
        )
    )
    landmarks = (
        bidir.select(F.col("src").alias("node")).distinct()
        .orderBy(md5_60_expr(F.col("node")).asc(), F.col("node").asc())
        .limit(n_landmarks)
        .select(F.col("node").alias("landmark"))
    )
    frontier = landmarks.select(
        "landmark", F.col("landmark").alias("node"),
        F.lit(0).alias("dist"), F.lit(1).cast("long").alias("sigma"),
    )
    reached = frontier
    for r in range(1, hops + 1):
        frontier = _ckpt(frontier)
        reached = _ckpt(reached)
        frontier = (
            frontier.join(bidir, frontier["node"] == bidir["src"])
            .groupBy("landmark", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(reached.select("landmark", "node"),
                  ["landmark", "node"], "left_anti")
            .select("landmark", "node", F.lit(r).alias("dist"), "sigma")
        )
        reached = reached.unionByName(frontier)
    return reached


def stress_centrality(edges: DataFrame,
                      n_landmarks: int = PATHS_LANDMARKS,
                      hops: int = PATHS_HOPS,
                      checkpoint: bool = True) -> DataFrame:
    """Landmark-pair stress centrality (Shimbel 1953) — the ALL-INTEGER
    sibling of betweenness: ``stress(v) = sum over landmark pairs s<t of
    sigma_sv * sigma_vt`` restricted to pairs where
    ``dist(s,v) + dist(v,t) = dist(s,t)`` (v lies on a geodesic).

    Why stress and not betweenness here: Brandes' dependency
    accumulation sums FLOAT ratios sigma_sv/sigma_st in data-dependent
    order — exactly the nondeterminism the engine's twin discipline
    forbids — while stress is a sum of BIGINT products, bit-exact in any
    order on any engine.  Source sampling (hash-uniform md5-order
    landmarks — see ``_bfs_sigma`` for why top-degree picks would be
    useless here) bounds the cost: the
    per-source BFS is O(L * edges * hops) and the geodesic test joins
    frames bounded by nodes x L, never all-pairs.

    Output: (entity, stress, n_geodesic_pairs) for entities carrying at
    least one landmark-pair geodesic."""
    from ..cache import tracked_persist

    # the sigma frame feeds three join roles (both pair sides + the s-t
    # distance lookup)
    lv = tracked_persist(_bfs_sigma(edges, n_landmarks, hops, checkpoint))
    a = lv.alias("a")
    b = lv.alias("b")
    d_st = lv.select(
        F.col("landmark").alias("_s"), F.col("node").alias("_t"),
        F.col("dist").alias("_dst"),
    )
    return (
        a.join(b, F.col("a.node") == F.col("b.node"))
        .where(F.col("a.landmark") < F.col("b.landmark"))
        .where((F.col("a.dist") > 0) & (F.col("b.dist") > 0))
        .join(
            d_st,
            (F.col("_s") == F.col("a.landmark"))
            & (F.col("_t") == F.col("b.landmark")),
        )
        .where(F.col("a.dist") + F.col("b.dist") == F.col("_dst"))
        .groupBy(F.col("a.node").alias("entity"))
        .agg(
            F.sum(F.col("a.sigma") * F.col("b.sigma")).alias("stress"),
            F.count(F.lit(1)).alias("n_geodesic_pairs"),
        )
    )


def stress_centrality_sql(mentions_sql: str, min_pair: int = 2,
                          n_landmarks: int = PATHS_LANDMARKS,
                          hops: int = PATHS_HOPS) -> str:
    """DuckDB twin: BFS-with-sigma rounds unrolled as materialized CTEs
    (frontier join + SUM + anti-join per round), then the identical
    landmark-pair geodesic join."""
    from .graph_sql import edges_prelude

    parts = [edges_prelude(mentions_sql, min_pair), f""",
    landmarks AS MATERIALIZED (
      SELECT node AS landmark FROM (SELECT DISTINCT src AS node FROM bidir)
      ORDER BY ('0x' || substr(md5(node), 1, 15))::BIGINT ASC, node ASC
      LIMIT {n_landmarks}),
    f0 AS MATERIALIZED (
      SELECT landmark, landmark AS node, 0 AS dist, 1::BIGINT AS sigma
      FROM landmarks),
    reach0 AS MATERIALIZED (SELECT * FROM f0)"""]
    for r in range(1, hops + 1):
        parts.append(f""",
    f{r} AS MATERIALIZED (
      SELECT f.landmark, e.dst AS node, {r} AS dist,
             SUM(f.sigma)::BIGINT AS sigma
      FROM f{r - 1} f JOIN bidir e ON e.src = f.node
      WHERE NOT EXISTS (SELECT 1 FROM reach{r - 1} x
                        WHERE x.landmark = f.landmark AND x.node = e.dst)
      GROUP BY 1, 2),
    reach{r} AS MATERIALIZED (
      SELECT * FROM reach{r - 1} UNION ALL SELECT * FROM f{r})""")
    parts.append(f"""
    SELECT a.node AS entity,
           SUM(a.sigma * b.sigma)::BIGINT AS stress,
           COUNT(*)::BIGINT AS n_geodesic_pairs
    FROM reach{hops} a
    JOIN reach{hops} b ON b.node = a.node AND a.landmark < b.landmark
    JOIN reach{hops} st ON st.landmark = a.landmark
                       AND st.node = b.landmark
    WHERE a.dist > 0 AND b.dist > 0
      AND a.dist + b.dist = st.dist
    GROUP BY a.node""")
    return "".join(parts)
