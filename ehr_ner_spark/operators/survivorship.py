"""Golden-record survivorship merge over near-duplicate clusters.

After dedup clustering (exact or MinHash/LSH) a curation pipeline does not
just DROP duplicates — it elects one *merged* survivor per cluster with
per-field rules (MDM survivorship): the canonical id, the longest content
variant, the majority metadata value.  This operator is the field-wise
merge over the engine's own LSH clusters.

Every election is a COMBINABLE aggregate (min / max / min-of-struct — the
communities.py vote trick), so the whole merge is two map-side-combined
``groupBy`` passes with no window and no sort: one over (cluster, lang) for
the majority vote, one over cluster for everything else.  At 100 TB the
exchange carries one row per (partition, cluster) — survivorship never
re-shuffles the documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_records(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """``docs (doc_id, text, lang, n_chars, ...)`` × ``clusters
    (doc_id, component)`` -> one merged survivor row per component:

    * ``rep_doc_id``    — canonical id: MIN(doc_id)
    * ``longest_doc_id``/``longest_len`` — content rule: longest text,
      ties -> min doc_id (min-of-struct, combinable)
    * ``major_lang``    — metadata rule: majority lang, ties -> min lang
    * ``max_n_chars``, ``n_members`` — merge provenance
    """
    from ..cache import tracked_persist

    # j feeds TWO aggregations (field elections + the lang majority vote);
    # without a persist the whole upstream — including the MinHash/LSH
    # clustering — executes twice
    j = tracked_persist(
        docs.join(clusters, "doc_id").select(
            "doc_id", "text", "lang", "n_chars", "component"
        )
    )
    base = (
        j.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("doc_id").alias("rep_doc_id"),
            F.min(
                F.struct(
                    (-F.length("text")).alias("neg_len"),
                    F.col("doc_id").alias("doc_id"),
                )
            ).alias("lw"),
            F.max("n_chars").cast("long").alias("max_n_chars"),
        )
        .select(
            "component",
            "n_members",
            "rep_doc_id",
            F.col("lw.doc_id").alias("longest_doc_id"),
            (-F.col("lw.neg_len")).cast("long").alias("longest_len"),
            "max_n_chars",
        )
    )
    lang_major = (
        j.groupBy("component", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("component")
        .agg(
            F.min(
                F.struct((-F.col("n")).alias("neg"), F.col("lang").alias("lang"))
            ).alias("w")
        )
        .select("component", F.col("w.lang").alias("major_lang"))
    )
    return base.join(lang_major, "component")


def golden_records_sql(clusters_sql: str) -> str:
    """DuckDB twin: identical elections via the MAX+equi-join form of the
    min-of-struct vote (purity.py precedent)."""
    return f"""
    WITH comp AS ({clusters_sql}),
    j AS (
      SELECT d.doc_id, d.text, d.lang, d.n_chars, c.component
      FROM documents d JOIN comp c ON d.doc_id = c.doc_id),
    base AS (
      SELECT component,
             COUNT(*)::BIGINT AS n_members,
             MIN(doc_id) AS rep_doc_id,
             MAX(length(text))::BIGINT AS longest_len,
             MAX(n_chars)::BIGINT AS max_n_chars
      FROM j GROUP BY 1),
    longest AS (
      SELECT j.component, MIN(j.doc_id) AS longest_doc_id
      FROM j JOIN base b
        ON b.component = j.component AND length(j.text) = b.longest_len
      GROUP BY 1),
    lc AS (
      SELECT component, lang, COUNT(*) AS n FROM j GROUP BY 1, 2),
    lmx AS (SELECT component, MAX(n) AS mx FROM lc GROUP BY 1),
    major AS (
      SELECT lc.component, MIN(lc.lang) AS major_lang
      FROM lc JOIN lmx ON lmx.component = lc.component AND lc.n = lmx.mx
      GROUP BY 1)
    SELECT b.component, b.n_members, b.rep_doc_id,
           l.longest_doc_id, b.longest_len, b.max_n_chars, m.major_lang
    FROM base b
    JOIN longest l ON l.component = b.component
    JOIN major m ON m.component = b.component
    """
