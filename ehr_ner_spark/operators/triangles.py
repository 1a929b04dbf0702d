"""Triangle counting + local clustering coefficients over the entity
co-occurrence graph — the classic graph-quality signal for KG curation
(a high-clustering entity sits in a dense association neighborhood; a
zero-clustering high-degree entity is a promiscuous hub worth review).

Spark-first shape — the textbook degree-orientation algorithm (Cohen's
MapReduce triangle counting / "compact-forward"):

* every undirected edge is oriented from its LOWER (degree, name) endpoint
  to its higher one, so each node's oriented out-degree is bounded by
  O(sqrt(edges)) on any graph (arboricity bound) — the wedge self-join
  below can never blow up on a hub the way a naive neighbor-pair join
  would (a degree-1M entity contributes zero wedges from its hub side);
* wedges are ONE equi-join of the oriented edge frame with itself on the
  spoke node + a tuple inequality to canonicalize, then one equi-join
  against the oriented edges to close the triangle — three shuffles total,
  all on edge keys;
* per-node counts explode each triangle to its three corners and
  map-side-combine.

Everything is integer counts and string compares until the final
clustering coefficient ``2*t / (deg*(deg-1))`` — exact small-integer
arithmetic in doubles + the shared 1e-6 half-away snap, so the DuckDB
twin is bit-identical.

Reference contact: none (corpus-level graph analytics); extension in the
same family as operators/pagerank.py and operators/communities.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lt(da, na, db, nb):
    """(deg, name) tuple-order predicate: (da, na) < (db, nb)."""
    return (da < db) | ((da == db) & (na < nb))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Undirected distinct (ent_a < ent_b) edges -> per-entity
    (entity, deg, n_tri, clustering)."""
    from ..cache import tracked_persist

    edges = tracked_persist(edges.select("ent_a", "ent_b"))
    deg = tracked_persist(
        edges.select(F.col("ent_a").alias("node"))
        .unionByName(edges.select(F.col("ent_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge low-(deg, name) -> high-(deg, name), carrying the
    # destination's degree so wedge canonicalization never needs a join
    ed = (
        edges.join(deg.select(F.col("node").alias("ent_a"),
                              F.col("deg").alias("da")), "ent_a")
        .join(deg.select(F.col("node").alias("ent_b"),
                         F.col("deg").alias("db")), "ent_b")
    )
    fwd = _lt(F.col("da"), F.col("ent_a"), F.col("db"), F.col("ent_b"))
    oriented = tracked_persist(
        ed.select(
            F.when(fwd, F.col("ent_a")).otherwise(F.col("ent_b")).alias("src"),
            F.when(fwd, F.col("ent_b")).otherwise(F.col("ent_a")).alias("dst"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("ddst"),
        )
    )
    e1 = oriented.select(F.col("src"), F.col("dst").alias("v"),
                         F.col("ddst").alias("dv"))
    e2 = oriented.select(F.col("src"), F.col("dst").alias("w"),
                         F.col("ddst").alias("dw"))
    wedges = e1.join(e2, "src").where(
        _lt(F.col("dv"), F.col("v"), F.col("dw"), F.col("w"))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select(
        F.col("src").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(corners, "node", "left")
        .select(
            F.col("node").alias("entity"),
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.floor(
                    2.0 * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("deg").cast("double") * (F.col("deg") - 1))
                    * F.lit(1000000.0) + F.lit(0.5)
                ) / F.lit(1000000.0),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )


def triangle_stats_sql(mentions_sql: str, min_pair: int = 2) -> str:
    """DuckDB twin over the same entity edges (see communities.py for the
    edge construction): same orientation, wedge join, and snap."""
    return f"""
    WITH mentions AS ({mentions_sql}),
    ents AS (SELECT DISTINCT doc_id, text FROM mentions),
    ed AS MATERIALIZED (
      SELECT a.text AS ent_a, b.text AS ent_b
      FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.text < b.text
      GROUP BY a.text, b.text
      HAVING COUNT(*) >= {min_pair}),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT ent_a AS node FROM ed UNION ALL SELECT ent_b AS node FROM ed)
      GROUP BY node),
    oriented AS MATERIALIZED (
      SELECT CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND e.ent_a < e.ent_b)
                  THEN e.ent_a ELSE e.ent_b END AS src,
             CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND e.ent_a < e.ent_b)
                  THEN e.ent_b ELSE e.ent_a END AS dst,
             CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND e.ent_a < e.ent_b)
                  THEN db.deg ELSE da.deg END AS ddst
      FROM ed e
      JOIN deg da ON da.node = e.ent_a
      JOIN deg db ON db.node = e.ent_b),
    tri AS MATERIALIZED (
      SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM oriented e1
      JOIN oriented e2 ON e2.src = e1.src
        AND ((e1.ddst < e2.ddst)
             OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
      JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
    corners AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT x AS node FROM tri UNION ALL
        SELECT y AS node FROM tri UNION ALL
        SELECT z AS node FROM tri)
      GROUP BY node)
    SELECT d.node AS entity, d.deg,
           COALESCE(c.n_tri, 0)::BIGINT AS n_tri,
           CASE WHEN d.deg >= 2 THEN
             FLOOR(2.0 * COALESCE(c.n_tri, 0)
                   / (d.deg::DOUBLE * (d.deg - 1)) * 1000000.0 + 0.5)
               / 1000000.0
           ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN corners c ON c.node = d.node
    """
