"""Type-ontology rollup: transitive-closure aggregation of mention counts
up a (leaf type -> group -> kind -> root) hierarchy.

The reference's 31 battery codes are not flat — ``data_process/df2qasl.py``'s
priority table groups them by clinical category (stay dates, ward dates,
emergency/outpatient/radiotherapy/surgery/chemo date triplets, visit counts,
and the three concept types).  This operator makes that implicit taxonomy a
first-class KG dimension and answers "how many mentions roll up under each
ancestor label", the ontology-rollup query every type-hierarchy KG serves.

Scale design (100 TB): the hierarchy is a DIMENSION — a few dozen edges that
never grow with the corpus — so its transitive closure is computed in plain
Python on the driver (NOT an iterative join on the fact table) and shipped
as a broadcast.  The fact side is first collapsed map-side to at most one
row per leaf type (``groupBy(type)`` with partial aggregation), so the join
multiplies ~31 rows by closure depth, never the mention stream.  The only
full-data shuffle is the initial per-type count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# leaf battery code -> category group (mirrors the df2qasl.py grouping:
# data_process/df2qasl.py:121-149 assigns one priority band per category).
GROUP_OF: dict[str, str] = {
    "ADD": "STAY_DATE", "DCD": "STAY_DATE",
    "ICD": "WARD_DATE", "OCD": "WARD_DATE", "IBD": "WARD_DATE",
    "OBD": "WARD_DATE", "IND": "WARD_DATE", "OND": "WARD_DATE",
    "EMD": "EMERGENCY_DATE", "EMDS": "EMERGENCY_DATE",
    "EMDE": "EMERGENCY_DATE",
    "OPD": "OUTPATIENT_DATE", "OPDS": "OUTPATIENT_DATE",
    "OPDE": "OUTPATIENT_DATE",
    "RTD": "RADIOTHERAPY_DATE", "RTDS": "RADIOTHERAPY_DATE",
    "RTDE": "RADIOTHERAPY_DATE",
    "SGD": "SURGERY_DATE", "SGDS": "SURGERY_DATE", "SGDE": "SURGERY_DATE",
    "CTD": "CHEMO_DATE", "CTDS": "CHEMO_DATE", "CTDE": "CHEMO_DATE",
    "EMC": "VISIT_COUNT", "OPC": "VISIT_COUNT", "RTC": "VISIT_COUNT",
    "SGC": "VISIT_COUNT", "CTC": "VISIT_COUNT",
    "SGN": "PROCEDURE_CONCEPT", "DTN": "DRUG_CONCEPT",
    "DPN": "DEPT_CONCEPT",
}

# category group -> kind, kind -> root.
KIND_OF: dict[str, str] = {
    "STAY_DATE": "DATE", "WARD_DATE": "DATE", "EMERGENCY_DATE": "DATE",
    "OUTPATIENT_DATE": "DATE", "RADIOTHERAPY_DATE": "DATE",
    "SURGERY_DATE": "DATE", "CHEMO_DATE": "DATE",
    "VISIT_COUNT": "COUNT",
    "PROCEDURE_CONCEPT": "CLINICAL_CONCEPT",
    "DRUG_CONCEPT": "CLINICAL_CONCEPT", "DEPT_CONCEPT": "CLINICAL_CONCEPT",
    "DATE": "ENTITY", "COUNT": "ENTITY", "CLINICAL_CONCEPT": "ENTITY",
}

PARENT_OF: dict[str, str] = {**GROUP_OF, **KIND_OF}


def hierarchy_closure() -> list[tuple[str, str, int]]:
    """(leaf_type, ancestor, ancestor_level) rows — the reflexive
    transitive closure of PARENT_OF restricted to leaf battery codes.
    Level 0 = the leaf itself, 1 = category group, 2 = kind, 3 = root."""
    rows = []
    for leaf in GROUP_OF:
        node, level = leaf, 0
        rows.append((leaf, leaf, 0))
        while node in PARENT_OF:
            node = PARENT_OF[node]
            level += 1
            rows.append((leaf, node, level))
    return rows


def hierarchy_edges_values_sql() -> str:
    """``(child, parent)`` VALUES list for the DuckDB recursive twin."""
    return ", ".join(
        f"('{c}', '{p}')" for c, p in sorted(PARENT_OF.items())
    )


def type_rollup(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """Mentions ``(doc_id, type, ...)`` -> per-ancestor rollup
    ``(ancestor, level, n_types, n_mentions)``.

    ``n_types`` counts the DISTINCT leaf types (with >=1 mention) under the
    ancestor; ``n_mentions`` sums their mention counts.  Level-0 rows are
    the leaves themselves, so the output contains the full lattice."""
    closure = spark.createDataFrame(
        hierarchy_closure(), "leaf string, ancestor string, level int"
    )
    by_type = mentions.groupBy(F.col("type").alias("leaf")).agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    return (
        by_type.join(F.broadcast(closure), "leaf")
        .groupBy("ancestor", "level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("n_mentions").cast("long").alias("n_mentions"),
        )
    )


def type_rollup_sql(mentions_sql: str) -> str:
    """DuckDB twin: recursive-CTE closure over the same VALUES edge list,
    joined to the same per-type counts."""
    return f"""
    WITH RECURSIVE mentions AS ({mentions_sql}),
    edges(child, parent) AS (VALUES {hierarchy_edges_values_sql()}),
    anc(leaf, ancestor, level) AS (
      SELECT child, child, 0 FROM edges
      WHERE child NOT IN (SELECT parent FROM edges)
      UNION ALL
      SELECT a.leaf, e.parent, a.level + 1
      FROM anc a JOIN edges e ON a.ancestor = e.child),
    by_type AS (
      SELECT type AS leaf, COUNT(*) AS n_mentions
      FROM mentions GROUP BY 1)
    SELECT a.ancestor, a.level,
           COUNT(*)::BIGINT AS n_types,
           SUM(t.n_mentions)::BIGINT AS n_mentions
    FROM by_type t JOIN anc a ON t.leaf = a.leaf
    GROUP BY 1, 2
    """
