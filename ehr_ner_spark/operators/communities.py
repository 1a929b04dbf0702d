"""Community detection over the entity co-occurrence graph: synchronous
label propagation (LPA), the classic near-linear community algorithm for
KG enrichment — groups drugs/diseases/treatments that keep appearing in
the same clinical notes into candidate "topic" communities.

Spark-first shape, fourth iterative graph operator in the family (after
connected components, k-means, PageRank) — fully declarative, no driver
round-trip at all:

* edges are the distinct per-doc entity pairs with support >= ``min_pair``
  (the same doc-keyed a<b self-join as operators/cooccur.py — fan-out
  bounded by a document-local constant), deduplicated once and persisted;
* each round is ONE equi-join of the label frame onto the doubled edge
  frame + a map-side-combined (node, label) count + a node-partitioned
  window argmax — shuffle volume O(edges) per round at any scale;
* the label vector stays distributed end to end.

Determinism (why this oracle is exact with zero float discipline):
synchronous updates, every node votes its own current label once plus one
vote per neighbor, and the winner is (max votes, then LEXICOGRAPHICALLY
SMALLEST label) — pure integer counts and string comparisons, so the
unrolled-CTE DuckDB twin matches bit-for-bit.  Asynchronous/randomized
LPA (the Raghavan et al. 2007 original) trades determinism for faster
convergence; a fixed small round count with the self-vote is the standard
deterministic variant (GraphFrames' labelPropagation uses the same
synchronous shape).

Reference contact: the reference surfaces per-document mention lists only
(ner_api.py); corpus-level graph analytics is an engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LPA_ITERS = 4
LPA_MIN_PAIR = 2


def entity_edges(mentions: DataFrame, min_pair: int = LPA_MIN_PAIR) -> DataFrame:
    """(doc_id, text) mentions -> undirected distinct entity edges
    (ent_a < ent_b) with co-occurrence support >= ``min_pair``."""
    ents = mentions.select("doc_id", "text").distinct()
    a = ents.select("doc_id", F.col("text").alias("ent_a"))
    b = ents.select("doc_id", F.col("text").alias("ent_b"))
    return (
        a.join(b, "doc_id")
        .where(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair)
        .select("ent_a", "ent_b")
    )


def label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """Undirected (ent_a, ent_b) edges -> (entity, community, n_members)
    after ``iters`` synchronous LPA rounds seeded with label = own name.

    The winner rule (votes DESC, label ASC) is evaluated as
    ``min(struct(-votes, label))`` — a map-side-combinable aggregation
    instead of a node-partitioned window, so each round is two partial
    aggregations and one join with NO sort anywhere."""
    from ..cache import tracked_persist

    bidir = tracked_persist(
        edges.select(F.col("ent_a").alias("src"), F.col("ent_b").alias("dst"))
        .unionByName(
            edges.select(F.col("ent_b").alias("src"), F.col("ent_a").alias("dst"))
        )
    )
    labels = bidir.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iters):
        nbr = bidir.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        votes = (
            nbr.unionByName(labels)
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("votes")).alias("nv"),
                        F.col("label").alias("label"),
                    )
                ).alias("w")
            )
            .select("node", F.col("w.label").alias("label"))
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("entity"),
        F.col("label").alias("community"),
        "n_members",
    )


def label_propagation_sql(
    mentions_sql: str,
    iters: int = LPA_ITERS,
    min_pair: int = LPA_MIN_PAIR,
) -> str:
    """DuckDB twin: same edges, same synchronous rounds unrolled as
    materialized CTEs, same (votes DESC, label ASC) winner rule."""
    parts = [f"""
    WITH mentions AS ({mentions_sql}),
    ents AS (SELECT DISTINCT doc_id, text FROM mentions),
    ed AS MATERIALIZED (
      SELECT a.text AS ent_a, b.text AS ent_b
      FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.text < b.text
      GROUP BY a.text, b.text
      HAVING COUNT(*) >= {min_pair}),
    bidir AS MATERIALIZED (
      SELECT ent_a AS src, ent_b AS dst FROM ed
      UNION ALL SELECT ent_b AS src, ent_a AS dst FROM ed),
    l0 AS MATERIALIZED (
      SELECT src AS node, src AS label FROM (SELECT DISTINCT src FROM bidir))"""]
    for it in range(1, iters + 1):
        parts.append(f""",
    v{it} AS MATERIALIZED (
      SELECT node, label, COUNT(*) AS votes FROM (
        SELECT e.dst AS node, l.label FROM bidir e
        JOIN l{it - 1} l ON l.node = e.src
        UNION ALL SELECT node, label FROM l{it - 1})
      GROUP BY node, label),
    l{it} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label, ROW_NUMBER() OVER (
          PARTITION BY node ORDER BY votes DESC, label ASC) AS rn
        FROM v{it})
      WHERE rn = 1)""")
    parts.append(f""",
    sizes AS (SELECT label, COUNT(*) AS n_members FROM l{iters} GROUP BY label)
    SELECT l.node AS entity, l.label AS community, s.n_members
    FROM l{iters} l JOIN sizes s ON s.label = l.label""")
    return "".join(parts)
