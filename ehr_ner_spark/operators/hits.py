"""HITS (hubs & authorities, Kleinberg 1999) over the engine's own
knowledge graph — the directed companion to :mod:`pagerank`'s undirected
power iteration.  On the (doc)-[hasEntityType]->(entity) bipartite triple
graph the split is natural: documents act as hubs (they point at many
good entities), entity surfaces act as authorities (they are pointed at
by many good documents).

Spark-first shape (the pagerank discipline, directed):

* edges deduplicated once and persisted — every round reuses the frame;
* each half-round is ONE equi-join of the opposite score vector onto the
  edge frame plus a map-side-combined groupBy — shuffle O(edges);
* normalization uses the L-infinity norm (divide by the max score), not
  HITS' textbook L2: the max of snapped doubles is exact and its single
  1-row frame broadcasts into the rescale projection, whereas an L2 norm
  would inject a sqrt whose last-ulp behaviour the SQL twin cannot pin.
  L-inf-normalized HITS converges to the same principal eigenvectors up
  to scale.

Oracle exactness: scores snap to the shared ``floor(x*1e9 + 0.5)/1e9``
grid after every sum and after every rescale, so accumulation-order noise
(~1e-14) cannot walk the engine and the unrolled-CTE DuckDB twin apart;
outputs report on the 1e-6 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HITS_ITERS = 2


def _snap(col, scale: int):
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))


def hits(triples: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """(subj, obj) triples -> (node, kind, score): L-inf-normalized hub
    scores for subjects and authority scores for objects after ``iters``
    HITS rounds from the uniform hub vector."""
    from ..cache import tracked_persist

    ed = tracked_persist(
        triples.select(F.col("subj").alias("d"), F.col("obj").alias("e")).distinct()
    )
    hub = ed.select("d").distinct().select("d", F.lit(1.0).alias("h"))

    auth = None
    for _ in range(iters):
        auth = (
            ed.join(hub, "d")
            .groupBy("e")
            .agg(_snap(F.sum("h"), 1_000_000_000).alias("a"))
        )
        amax = auth.agg(F.max("a").alias("_m"))
        auth = auth.crossJoin(F.broadcast(amax)).select(
            "e", _snap(F.col("a") / F.col("_m"), 1_000_000_000).alias("a")
        )
        hub = (
            ed.join(auth, "e")
            .groupBy("d")
            .agg(_snap(F.sum("a"), 1_000_000_000).alias("h"))
        )
        hmax = hub.agg(F.max("h").alias("_m"))
        hub = hub.crossJoin(F.broadcast(hmax)).select(
            "d", _snap(F.col("h") / F.col("_m"), 1_000_000_000).alias("h")
        )
    return hub.select(
        F.col("d").alias("node"),
        F.lit("hub").alias("kind"),
        _snap(F.col("h"), 1_000_000).alias("score"),
    ).unionByName(
        auth.select(
            F.col("e").alias("node"),
            F.lit("authority").alias("kind"),
            _snap(F.col("a"), 1_000_000).alias("score"),
        )
    )


def hits_oracle_sql(triples_sql: str, iters: int = HITS_ITERS) -> str:
    """DuckDB twin: the same HITS rounds unrolled as materialized CTEs
    over the same (subj, obj) triple relation."""
    parts = [f"""
    WITH ct AS (SELECT * FROM ({triples_sql}) t),
    ed AS MATERIALIZED (SELECT DISTINCT subj AS d, obj AS e FROM ct),
    h0 AS (SELECT DISTINCT d, 1.0::DOUBLE AS h FROM ed)"""]
    for it in range(1, iters + 1):
        parts.append(f""",
    a{it}raw AS MATERIALIZED (
      SELECT e.e, FLOOR(SUM(h.h) * 1000000000 + 0.5) / 1000000000 AS a
      FROM ed e JOIN h{it - 1} h ON h.d = e.d GROUP BY e.e),
    a{it} AS MATERIALIZED (
      SELECT e, FLOOR((a / (SELECT MAX(a) FROM a{it}raw)) * 1000000000 + 0.5)
                  / 1000000000 AS a
      FROM a{it}raw),
    h{it}raw AS MATERIALIZED (
      SELECT e.d, FLOOR(SUM(a.a) * 1000000000 + 0.5) / 1000000000 AS h
      FROM ed e JOIN a{it} a ON a.e = e.e GROUP BY e.d),
    h{it} AS MATERIALIZED (
      SELECT d, FLOOR((h / (SELECT MAX(h) FROM h{it}raw)) * 1000000000 + 0.5)
                  / 1000000000 AS h
      FROM h{it}raw)""")
    parts.append(f"""
    SELECT d AS node, 'hub' AS kind,
           FLOOR(h * 1000000 + 0.5) / 1000000 AS score
    FROM h{iters}
    UNION ALL
    SELECT e AS node, 'authority' AS kind,
           FLOOR(a * 1000000 + 0.5) / 1000000 AS score
    FROM a{iters}""")
    return "".join(parts)
