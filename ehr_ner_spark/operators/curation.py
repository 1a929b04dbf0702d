"""The whole training-data curation funnel as ONE driver-checkable query —
the composition capstone of the pipeline-operator family, mirroring
`kg_canonical_triples`' whole-pipeline oracle on the KG side.

Funnel (the standard pre-training hygiene sequence):

    all docs
      -> language filter        (lang_id == 'en')
      -> quality filter         (composite score >= quality_min)
      -> exact-dup removal      (keep the min-doc_id copy of identical text)
      -> near-dup removal       (keep the min-doc_id member of each
                                 MinHash/LSH cluster)
      -> benchmark holdout      (drop the synthetic eval-set members)
      -> decontamination        (drop training docs sharing >= 2 shingles
                                 with any benchmark doc)

Spark-first shape: every stage's verdict lands as a BOOLEAN FLAG COLUMN on
one frame (per-doc equi-joins of the existing operators' outputs), and the
funnel counts come from a SINGLE aggregation over that frame — conditional
sums with map-side partial combine, one action for all seven stages.  No
stage materializes an intermediate "surviving corpus"; at 100 TB the only
costs are the underlying operators (each already individually
bucket/broadcast-shaped and oracle-checked) plus one scan.

Output: (stage, criterion, docs_surviving) — cumulative survivor counts,
all-integer, hash-stable.  The DuckDB twin composes the SAME oracle SQL
the individual queries register (lang_id_sql, QUALITY_SQL,
minhash_dedup_oracle_sql, decontaminate_sql) as subqueries — proving the
pieces compose, not just that they pass alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUALITY_MIN = 0.5
NEARDUP_THRESHOLD = 0.6

_STAGES = (
    "all",
    "lang_en",
    "quality",
    "exact_canonical",
    "neardup_canonical",
    "benchmark_holdout",
    "decontaminated",
)


def curation_funnel(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    threshold: float = NEARDUP_THRESHOLD,
) -> DataFrame:
    """documents (doc_id, text) -> 7-row cumulative survivor funnel."""
    from .dedup import DECON_MOD, decontaminate, exact_dedup, minhash_lsh_dedup
    from .textops import lang_id, quality_scores

    spark = docs.sparkSession
    base = docs.select("doc_id")
    lang = lang_id(docs).select("doc_id", "lang_pred")
    qual = quality_scores(docs).select("doc_id", "quality")
    exact = exact_dedup(docs).select("doc_id", "canonical_doc_id")
    clusters = minhash_lsh_dedup(docs, threshold=threshold)
    canon = clusters.groupBy("component").agg(F.min("doc_id").alias("canon_id"))
    near = clusters.join(canon, "component").select("doc_id", "canon_id")
    contam = decontaminate(docs).select(
        "doc_id", F.lit(True).alias("contaminated")
    )

    flags = (
        base.join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(exact, "doc_id")
        .join(near, "doc_id")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("lang_pred") == "en").alias("f1"),
            (F.col("quality") >= quality_min).alias("f2"),
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("f3"),
            (F.col("doc_id") == F.col("canon_id")).alias("f4"),
            (F.col("doc_id") % DECON_MOD != 0).alias("f5"),
            F.col("contaminated").isNull().alias("f6"),
        )
    )
    conds = [F.lit(True)]
    for i in range(1, 7):
        conds.append(conds[-1] & F.col(f"f{i}"))
    row = flags.agg(
        *[
            F.sum(F.when(c, 1).otherwise(0)).alias(f"s{i}")
            for i, c in enumerate(conds)
        ]
    ).collect()[0]
    out = [
        (i, _STAGES[i], int(row[f"s{i}"])) for i in range(len(_STAGES))
    ]
    return spark.createDataFrame(
        out, "stage int, criterion string, docs_surviving long"
    )


def curation_funnel_oracle_sql(
    quality_min: float = QUALITY_MIN,
    threshold: float = NEARDUP_THRESHOLD,
) -> str:
    """DuckDB twin: the registered per-operator oracles, composed."""
    from .dedup import DECON_MOD, decontaminate_sql
    from .mention_sql import minhash_dedup_oracle_sql
    from .textops import QUALITY_SQL, lang_id_sql

    stage_rows = []
    for i, name in enumerate(_STAGES):
        cond = " AND ".join(f"f{k}" for k in range(1, i + 1)) or "TRUE"
        stage_rows.append(
            f"SELECT {i} AS stage, '{name}' AS criterion,\n"
            f"             SUM(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT"
            f" AS docs_surviving FROM flags"
        )
    body = "\n      UNION ALL\n      ".join(stage_rows)
    return f"""
    WITH l AS (SELECT doc_id, lang_pred FROM ({lang_id_sql()}) t),
    q AS (SELECT doc_id, quality FROM ({QUALITY_SQL}) t),
    eg AS (SELECT text, MIN(doc_id) AS canonical_doc_id
           FROM documents GROUP BY text),
    e AS (SELECT d.doc_id, eg.canonical_doc_id
          FROM documents d JOIN eg USING (text)),
    cl AS (SELECT * FROM ({minhash_dedup_oracle_sql(threshold)}) t),
    cm AS (SELECT component, MIN(doc_id) AS canon_id
           FROM cl GROUP BY component),
    nr AS (SELECT cl.doc_id, cm.canon_id FROM cl JOIN cm USING (component)),
    ct AS (SELECT doc_id FROM ({decontaminate_sql()}) t),
    flags AS (
      SELECT d.doc_id,
             (l.lang_pred = 'en') AS f1,
             (q.quality >= {quality_min}) AS f2,
             (d.doc_id = e.canonical_doc_id) AS f3,
             (d.doc_id = nr.canon_id) AS f4,
             (d.doc_id % {DECON_MOD} <> 0) AS f5,
             (ct.doc_id IS NULL) AS f6
      FROM documents d
      JOIN l USING (doc_id)
      JOIN q USING (doc_id)
      JOIN e USING (doc_id)
      JOIN nr USING (doc_id)
      LEFT JOIN ct USING (doc_id))
    SELECT * FROM (
      {body})"""
