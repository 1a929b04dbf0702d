"""Domain-targeted data selection via hashed-ngram importance weights —
the DSIR recipe (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", public paper) in the engine's log-free
cross-engine-exact form.

A target domain (here: the ``lang = DSIR_TARGET_LANG`` slice of the
corpus, standing in for "high-quality in-domain text") and the raw
corpus each induce a unigram distribution over ``DSIR_BUCKETS`` hashed
feature buckets.  Each bucket gets an add-one-smoothed likelihood-ratio
score — the per-feature factor of the DSIR importance weight — and a
document's weight is the SUM of its tokens' bucket scores (the linear /
log-space form of the product weight, with the per-bucket ratio snapped
to the shared 1e-6 half-away grid BEFORE the sum so the per-doc total is
an order-free integer sum on both engines).  Ranking by weight-per-token
removes document-length bias; the top ``DSIR_TOPK`` rows are the
selection a resampling pass would draw first.

Cross-engine exactness: the bucket score is ONE double expression tree
written character-identically in Spark SQL and DuckDB —
``floor((((t+1)/(t_tot+B)) / ((r+1)/(r_tot+B))) * 1e6 + 0.5)`` — and
every IEEE multiply/divide is correctly rounded, so identical integer
inputs give the identical double, hence the identical snapped integer
(the chi2 / fd-audit precedent).  Everything before and after is BIGINT.

100-TB shape: tokenize + hash are map-only; bucket counts are ONE
map-side-combined aggregate to <= DSIR_BUCKETS rows; the score table
broadcasts back onto the token stream (a broadcast hash join — no
shuffle of the exploded tokens); per-doc weights are a second map-side-
combined aggregate keyed by doc_id; the final ranking is a distributed
top-K (TakeOrdered — no global sort shuffle).  The only frames that ever
cross an exchange are the B-row score table and the n_docs-row weight
frame.  Zipf-head terms only fatten individual bucket counters, which
partial aggregation absorbs map-side.  The token stream is produced
twice (counts pass, weights pass) BY DESIGN: both are map-side-only
explosions of the scan, and recomputing beats materializing an exploded
token column at corpus scale.

Reference contact: none (training-data curation family; complements
ds_quality / ds_lm_buckets which score documents standalone — DSIR
scores them *against a target distribution*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_SALT = "dsir"
DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"
DSIR_TOPK = 50

# the one double expression tree, shared character-for-character by the
# Spark plan and the DuckDB twin (correctly-rounded IEEE ops + identical
# association order == identical doubles == identical snapped integers)
_SCORE_EXPR = (
    "CAST(FLOOR((((CAST(t_cnt AS DOUBLE) + 1.0)"
    " / (CAST(t_tot AS DOUBLE) + {b}.0))"
    " / ((CAST(r_cnt AS DOUBLE) + 1.0)"
    " / (CAST(r_tot AS DOUBLE) + {b}.0)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


def _bucketed_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, lang, bucket) — one row per [a-z]+ token occurrence,
    hashed onto the shared md5-60 grid.  Map-only."""
    from ..hashing import md5_60_expr

    return docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("term"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            md5_60_expr(F.concat(F.lit(DSIR_SALT + ":"), F.col("term"))),
            F.lit(DSIR_BUCKETS),
        ).alias("bucket"),
    )


def dsir_select(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Top-DSIR_TOPK documents by target-domain importance weight.

    Output: (doc_id, lang, n_terms, weight, weight_per_token), ordered
    by (weight_per_token DESC, doc_id ASC).
    """
    toks = _bucketed_tokens(docs, text_col)
    counts = toks.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).cast("long").alias("t_cnt"),
        F.count(F.lit(1)).cast("long").alias("r_cnt"),
    )
    tot = counts.agg(
        F.sum("t_cnt").cast("long").alias("t_tot"),
        F.sum("r_cnt").cast("long").alias("r_tot"),
    )
    scores = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(_SCORE_EXPR.format(b=DSIR_BUCKETS)).alias("score"),
    )
    weights = (
        toks.join(F.broadcast(scores), "bucket")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("score").cast("long").alias("weight"),
        )
        # score >= 0 and n_terms > 0, so DIV (truncating) == floor here
        .withColumn(
            "weight_per_token", F.expr("weight DIV n_terms").cast("long")
        )
    )
    return (
        weights.orderBy(
            F.col("weight_per_token").desc(), F.col("doc_id").asc()
        )
        .limit(DSIR_TOPK)
        .select("doc_id", "lang", "n_terms", "weight", "weight_per_token")
    )


def dsir_select_sql(table: str = "documents",
                    text_col: str = "text") -> str:
    """DuckDB twin — same hash grid, same score expression tree."""
    from ..hashing import MD5_60_SQL

    h = MD5_60_SQL.format(x=f"'{DSIR_SALT}:' || term")
    score = _SCORE_EXPR.format(b=DSIR_BUCKETS)
    return f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(lower({text_col}), '[a-z]+')) AS term
      FROM {table}
    ), b AS (
      SELECT doc_id, lang, ({h}) % {DSIR_BUCKETS} AS bucket FROM toks
    ), counts AS (
      SELECT bucket,
             SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)::BIGINT AS t_cnt,
             COUNT(*)::BIGINT AS r_cnt
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT SUM(t_cnt)::BIGINT AS t_tot, SUM(r_cnt)::BIGINT AS r_tot
      FROM counts
    ), scores AS (
      SELECT bucket, {score} AS score FROM counts, tot
    ), w AS (
      SELECT b.doc_id,
             MIN(b.lang) AS lang,
             COUNT(*)::BIGINT AS n_terms,
             SUM(s.score)::BIGINT AS weight
      FROM b JOIN scores s USING (bucket)
      GROUP BY b.doc_id
    )
    SELECT doc_id, lang, n_terms, weight,
           (weight // n_terms)::BIGINT AS weight_per_token
    FROM w
    ORDER BY weight_per_token DESC, doc_id ASC
    LIMIT {DSIR_TOPK}
    """
