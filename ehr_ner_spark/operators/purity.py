"""Canonical-cluster type purity — the KG-quality gate on the entity
linking stage: after MinHash/LSH canonicalization merges surface forms,
did any cluster swallow mentions of DIFFERENT entity types (a drug
canonicalized together with a disease)?  Purity per canonical entity =
majority-type share of its mentions; impure clusters are the linking
errors a curator reviews first.

Spark-first shape: everything derives from the already-materialized
canonical triples frame — the type is embedded in the predicate, so the
whole metric is two map-side-combined aggregations (per-(entity, type)
counts, then a per-entity fold whose majority pick is the combinable
``min(struct(-cnt, type))`` trick from communities.py) — no window, no
sort, shuffle keyed on the canonical entity.  Purity is one small-integer
division snapped to the shared 1e-6 half-away grid, so the DuckDB twin is
bit-exact.

Reference contact: none (linking QA is an engine extension in the
family of operators/linking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRED_PREFIX = "hasEntityType:"


def cluster_purity(canonical: DataFrame) -> DataFrame:
    """Canonical triples (pred = hasEntityType:<type>, obj = canonical
    entity) -> (entity, n_mentions, n_types, majority_type, purity)."""
    counts = (
        canonical.select(
            F.col("obj").alias("entity"),
            F.expr(f"substring(pred, {len(PRED_PREFIX) + 1})").alias("type"),
        )
        .groupBy("entity", "type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy("entity")
        .agg(
            F.sum("n").alias("n_mentions"),
            F.count(F.lit(1)).alias("n_types"),
            F.min(
                F.struct((-F.col("n")).alias("neg"),
                         F.col("type").alias("type"))
            ).alias("w"),
        )
        .select(
            "entity",
            "n_mentions",
            "n_types",
            F.col("w.type").alias("majority_type"),
            (F.floor(
                (-F.col("w.neg")).cast("double") / F.col("n_mentions")
                * F.lit(1000000.0) + F.lit(0.5)
            ) / F.lit(1000000.0)).alias("purity"),
        )
    )


def cluster_purity_sql(canonical_triples_sql: str) -> str:
    """DuckDB twin over the same canonical-triples relation: identical
    counts, (votes DESC, type ASC) majority, and 1e-6 snap."""
    n = len(PRED_PREFIX) + 1
    return f"""
    WITH ct AS ({canonical_triples_sql}),
    counts AS (
      SELECT obj AS entity, substring(pred, {n}) AS type, COUNT(*) AS n
      FROM ct GROUP BY obj, substring(pred, {n})),
    folded AS (
      SELECT entity, SUM(n) AS n_mentions, COUNT(*) AS n_types,
             MAX(n) AS max_n
      FROM counts GROUP BY entity),
    majority AS (
      SELECT c.entity, MIN(c.type) AS majority_type
      FROM counts c JOIN folded f
        ON f.entity = c.entity AND c.n = f.max_n
      GROUP BY c.entity)
    SELECT f.entity, f.n_mentions::BIGINT AS n_mentions, f.n_types,
           m.majority_type,
           FLOOR(f.max_n::DOUBLE / f.n_mentions * 1000000.0 + 0.5)
             / 1000000.0 AS purity
    FROM folded f JOIN majority m ON m.entity = f.entity
    """
