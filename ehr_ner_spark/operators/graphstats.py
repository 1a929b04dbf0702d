"""Degree assortativity of the entity co-occurrence graph.

One number summarizing whether hub entities attach to other hubs (r > 0)
or to the periphery (r < 0) — the structural statistic that predicts how
badly the wedge/frontier joins in the graph family will skew, read next to
``kg_degree_distribution`` before running them at a new scale.

Computed as the Pearson correlation between deg(src) and deg(dst) over the
DOUBLED adjacency (the standard undirected formulation: each edge counted
in both orientations makes the statistic symmetric).  Follows the engine's
integer-moments discipline (operators/stats.py): degrees are exact BIGINTs,
the five moment SUMs are combinable BIGINT partial aggregates (map-side
combine, one exchange carrying one row per partition), and the only float
arithmetic is the final ratio — IEEE-identical to the DuckDB twin, snapped
to the shared half-away 1e-6 grid.

Scale notes (100 TB): degrees are one combinable count per node; joining
them onto both edge endpoints is two hash equi-joins keyed on the node id
(broadcast when the node set is small, shuffle-hash otherwise — left to
AQE); the moment aggregate reduces everything to ONE row.  No window, no
sort, no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import _R6, _r6


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Undirected ``(ent_a, ent_b)`` edges -> one row
    ``(n_nodes, n_edges, assortativity)``."""
    from ..cache import tracked_persist

    bidir = tracked_persist(
        edges.select(F.col("ent_a").alias("src"), F.col("ent_b").alias("dst"))
        .unionByName(
            edges.select(F.col("ent_b").alias("src"),
                         F.col("ent_a").alias("dst"))
        )
    )
    deg = tracked_persist(
        bidir.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    joined = (
        bidir.join(deg, "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("_dd")),
            "dst",
        )
        .select(F.col("deg").alias("_x"), F.col("_dd").alias("_y"))
    )
    m = joined.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov_num = n * F.col("_sxy").cast("double") - sx * sy
    var_x = n * F.col("_sxx").cast("double") - sx * sx
    var_y = n * F.col("_syy").cast("double") - sy * sy
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return n_nodes.crossJoin(
        m.select(
            (F.col("_n") / 2).cast("long").alias("n_edges"),
            _r6(cov_num / F.sqrt(var_x * var_y)).alias("assortativity"),
        )
    )


def degree_assortativity_sql(mentions_sql: str) -> str:
    """DuckDB twin over the shared edges prelude — identical BIGINT
    moments, identical final DOUBLE formula, identical rounding."""
    from .graph_sql import edges_prelude

    r6 = _R6.format(x="cn / sqrt(vx * vy)")
    return edges_prelude(mentions_sql) + f""",
    deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM bidir GROUP BY 1),
    j AS (
      SELECT ds.deg AS x, dd.deg AS y
      FROM bidir b
      JOIN deg ds ON b.src = ds.src
      JOIN deg dd ON b.dst = dd.src),
    m AS (
      SELECT COUNT(*)::BIGINT AS n,
             SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
             SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy,
             SUM(x * y)::BIGINT AS sxy
      FROM j),
    d AS (
      SELECT n,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cn,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vx,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vy
      FROM m)
    SELECT (SELECT COUNT(*)::BIGINT FROM deg) AS n_nodes,
           (n / 2)::BIGINT AS n_edges,
           {r6} AS assortativity
    FROM d
    """
