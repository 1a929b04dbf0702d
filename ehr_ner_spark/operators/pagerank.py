"""Distributed PageRank over the engine's OWN knowledge graph — entity
importance on the canonical (doc)-[hasEntityType]->(entity) bipartite graph
the linking stage emits.  The KG-analytics counterpart of the curation
funnel: a classic iterative graph operator the reference lacks, expressed
the way Spark wants it.

Spark-first shape — fully declarative, third iterative operator in the
family and the only one with NO driver round-trip at all:

* edges are deduplicated once and persisted; the undirected walk doubles
  them map-side (doc and entity namespaces are disjoint, so no pair
  collides with its reverse);
* each iteration is ONE equi-join of the rank frame onto the edge frame
  plus a map-side-combined groupBy on the destination node — the textbook
  DataFrame PageRank (what GraphX's Pregel compiles down to), shuffle
  volume O(edges) per round at any scale;
* the rank vector itself stays distributed — the only driver scalar is the
  node count.  Undirected walks have no dangling nodes (every node in the
  frame has >= 1 edge), so no mass-leak correction term is needed.

Oracle exactness (the kmeans discipline): ranks snap to the shared
``floor(x*1e9 + 0.5)/1e9`` grid after every update, so float
summation-order noise (~1e-14 over an in-neighborhood sum) cannot walk the
engine and the unrolled-iteration DuckDB twin apart; the damping constants
are forced to DOUBLE on the SQL side (a bare ``0.85`` would be DECIMAL and
``1 - 0.85`` exactly 0.15, which the IEEE ``0.15000000000000002`` is not).
Output ranks are reported on the 1e-6 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 3


def _snap(col, scale: int):
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))


def pagerank(
    triples: DataFrame, iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> DataFrame:
    """(subj, obj) triples -> (node, pr) over the undirected bipartite
    graph; ``iters`` power-iteration rounds from the uniform vector."""
    from ..cache import tracked_persist

    ed = triples.select(
        F.col("subj").alias("a"), F.col("obj").alias("b")
    ).distinct()
    bidir = tracked_persist(
        ed.unionByName(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    nodes = bidir.select(F.col("a").alias("node")).distinct()
    n = nodes.count()
    deg = tracked_persist(bidir.groupBy("a").agg(F.count("*").alias("outdeg")))

    ranks = nodes.select("node", _snap(F.lit(1.0 / n), 1_000_000_000).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            bidir.join(ranks, bidir["a"] == ranks["node"])
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            _snap(
                F.lit(base) + F.lit(damping) * F.sum("c"), 1_000_000_000
            ).alias("pr")
        )
    return ranks.select("node", _snap(F.col("pr"), 1_000_000).alias("pr"))


def pagerank_oracle_sql(
    triples_sql: str, iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> str:
    """DuckDB twin: the same power iterations unrolled as CTEs over the
    same (subj, obj) triple relation (pass the canonical-triples oracle as
    ``triples_sql``)."""
    d = f"{damping!r}::DOUBLE"
    parts = [f"""
    WITH ct AS (SELECT * FROM ({triples_sql}) t),
    ed AS (SELECT DISTINCT subj AS a, obj AS b FROM ct),
    bidir AS MATERIALIZED (
      SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed),
    nodes AS (SELECT DISTINCT a AS node FROM bidir),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT a, COUNT(*) AS outdeg FROM bidir GROUP BY a),
    r0 AS MATERIALIZED (
      SELECT node, FLOOR((1.0 / nn.n) * 1000000000 + 0.5) / 1000000000 AS pr
      FROM nodes, nn)"""]
    for it in range(1, iters + 1):
        parts.append(f""",
    r{it} AS MATERIALIZED (
      SELECT e.b AS node,
             FLOOR(((1 - {d}) / nn.n
                    + {d} * SUM(r.pr / dg.outdeg)) * 1000000000 + 0.5)
               / 1000000000 AS pr
      FROM bidir e
      JOIN r{it - 1} r ON r.node = e.a
      JOIN deg dg ON dg.a = e.a
      CROSS JOIN nn
      GROUP BY e.b, nn.n)""")
    parts.append(f"""
    SELECT node, FLOOR(pr * 1000000 + 0.5) / 1000000 AS pr FROM r{iters}""")
    return "".join(parts)
