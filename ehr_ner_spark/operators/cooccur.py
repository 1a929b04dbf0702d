"""Entity co-occurrence mining over the detected-mention stream: the
top-k entity pairs by lift (the PMI ratio without the log), the classic
KG-enrichment signal for drug-drug / drug-disease association candidates.

Spark-first shape, 100-TB story:

* per-doc entity sets are DISTINCT (doc_id, text) projections of the
  mention stream — one map-side-combined shuffle;
* pair generation is a doc-keyed self-join with ``a < b`` — fan-out is
  bounded by (distinct entities per doc)^2, a document-local constant, so
  the join never amplifies beyond what one doc's clinical note contains;
* marginals (n_a, n_b) come from one map-side-combined count and join back
  1:1 on the entity key (Zipf-headed keys only imbalance partition sizes —
  AQE splits those; no row amplification);
* the global top-k is orderBy+limit (TakeOrderedAndProject per-partition
  heaps — the qualifying-pair frame is vocabulary-squared-scale, far too
  large for a single-partition window); rnk ranks the <=k winner rows.

Oracle exactness: lift = (n_ab * N) / (n_a * n_b) is evaluated as a
product/quotient of exactly-representable integers-as-doubles (all counts
< 2^53), so the DuckDB twin is IEEE-bit-identical with NO log and no
rounding discipline beyond the shared 1e-6 output snap.

Reference contact: the reference surfaces only per-document mention lists
(ner_api.py); corpus-level association mining is an engine extension in
the spirit of its demo's co-display of DIN/DRUG rows (demo/app.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COOCCUR_TOP = 50
COOCCUR_MIN_PAIR = 2


def entity_cooccurrence(mentions: DataFrame, n_docs_df: DataFrame,
                        top: int = COOCCUR_TOP,
                        min_pair: int = COOCCUR_MIN_PAIR) -> DataFrame:
    """(doc_id, text) mentions + 1-row (n_docs) frame -> top-`top`
    (ent_a, ent_b, n_ab, n_a, n_b, lift, rnk) pairs by lift."""
    from pyspark.sql.window import Window

    from ..cache import tracked_persist

    # doc-level entity sets feed both the pair join and the marginals
    ents = tracked_persist(mentions.select("doc_id", "text").distinct())
    marg = ents.groupBy("text").agg(F.count(F.lit(1)).alias("n_ent"))

    a = ents.select("doc_id", F.col("text").alias("ent_a"))
    b = ents.select("doc_id", F.col("text").alias("ent_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair)
    )
    scored = (
        pairs.join(marg.select(F.col("text").alias("ent_a"),
                               F.col("n_ent").alias("n_a")), "ent_a")
        .join(marg.select(F.col("text").alias("ent_b"),
                          F.col("n_ent").alias("n_b")), "ent_b")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "ent_a", "ent_b", "n_ab", "n_a", "n_b",
            (
                F.floor(
                    (F.col("n_ab").cast("double")
                     * F.col("n_docs").cast("double"))
                    / (F.col("n_a").cast("double")
                       * F.col("n_b").cast("double"))
                    * F.lit(1000000.0) + F.lit(0.5)
                ) / F.lit(1000000.0)
            ).alias("lift"),
        )
    )
    winners = scored.orderBy(
        F.desc("lift"), F.asc("ent_a"), F.asc("ent_b")
    ).limit(top)
    w = Window.orderBy(F.desc("lift"), F.asc("ent_a"), F.asc("ent_b"))
    return winners.withColumn("rnk", F.row_number().over(w).cast("long"))


def entity_cooccurrence_sql(mentions_sql: str, corpus_sql: str,
                            top: int = COOCCUR_TOP,
                            min_pair: int = COOCCUR_MIN_PAIR) -> str:
    """DuckDB twin: same distinct-set / self-join / integer-exact lift."""
    return f"""
    WITH mentions AS ({mentions_sql}),
    nd AS (SELECT COUNT(*) AS n_docs FROM ({corpus_sql}) c),
    ents AS (SELECT DISTINCT doc_id, text FROM mentions),
    marg AS (SELECT text, COUNT(*) AS n_ent FROM ents GROUP BY text),
    pairs AS (
      SELECT a.text AS ent_a, b.text AS ent_b, COUNT(*) AS n_ab
      FROM ents a JOIN ents b
        ON a.doc_id = b.doc_id AND a.text < b.text
      GROUP BY a.text, b.text
      HAVING COUNT(*) >= {min_pair}),
    scored AS (
      SELECT p.ent_a, p.ent_b, p.n_ab, ma.n_ent AS n_a, mb.n_ent AS n_b,
             FLOOR((p.n_ab::DOUBLE * nd.n_docs::DOUBLE)
                   / (ma.n_ent::DOUBLE * mb.n_ent::DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS lift
      FROM pairs p
      JOIN marg ma ON ma.text = p.ent_a
      JOIN marg mb ON mb.text = p.ent_b
      CROSS JOIN nd)
    SELECT ent_a, ent_b, n_ab, n_a, n_b, lift, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift DESC, ent_a ASC, ent_b ASC) AS rnk
      FROM scored)
    WHERE rnk <= {top}
    """


RELATED_DF_CAP = 64
RELATED_MIN_SHARED = 2
RELATED_TOP = 50


def related_docs(mentions: DataFrame,
                 df_cap: int = RELATED_DF_CAP,
                 min_shared: int = RELATED_MIN_SHARED,
                 top: int = RELATED_TOP) -> DataFrame:
    """The doc-side mirror of entity co-occurrence — "related documents"
    by shared entity vocabulary: top-`top` (doc_a, doc_b, n_shared)
    pairs sharing >= `min_shared` distinct entities.

    Scale guard: the entity-keyed self-join fans out quadratically in an
    entity's document frequency, and corpus-hub entities appear in MOST
    docs — so entities with df > `df_cap` are excluded from pair
    generation via a broadcast anti-join BEFORE the self-join (the same
    hub cap as ngram_jaccard's NGRAM_DF_CAP and link_prediction's spoke
    cap; a hub entity carries no discriminative relatedness signal
    anyway).  The cap is applied identically in the DuckDB twin, so the
    oracle is exact."""
    from pyspark.sql.window import Window

    from ..cache import tracked_persist

    ents = tracked_persist(mentions.select("doc_id", "text").distinct())
    hubs = (
        ents.groupBy("text")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
        .select("text")
    )
    kept = ents.join(F.broadcast(hubs), "text", "left_anti")
    a = kept.select(F.col("doc_id").alias("doc_a"), "text")
    b = kept.select(F.col("doc_id").alias("doc_b"), "text")
    pairs = (
        a.join(b, "text")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    winners = pairs.orderBy(
        F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(top)
    w = Window.orderBy(F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b"))
    return winners.withColumn("rnk", F.row_number().over(w).cast("long"))


def related_docs_sql(mentions_sql: str,
                     df_cap: int = RELATED_DF_CAP,
                     min_shared: int = RELATED_MIN_SHARED,
                     top: int = RELATED_TOP) -> str:
    """DuckDB twin: identical hub cap, pair universe and rank order."""
    return f"""
    WITH mentions AS ({mentions_sql}),
    ents AS (SELECT DISTINCT doc_id, text FROM mentions),
    kept AS (
      SELECT doc_id, text FROM ents
      WHERE text NOT IN (
        SELECT text FROM ents GROUP BY text HAVING COUNT(*) > {df_cap})),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM kept a JOIN kept b
        ON a.text = b.text AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= {min_shared})
    SELECT doc_a, doc_b, n_shared, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY n_shared DESC, doc_a ASC, doc_b ASC) AS rnk
      FROM pairs)
    WHERE rnk <= {top}
    """
