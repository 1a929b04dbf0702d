"""Chi-square term-class association (supervised keyword / feature
selection): for every language, the terms whose document-presence is most
dependent on that language — the classic filter behind language-marker
discovery, domain classifiers, and vocabulary pruning for a 100-TB corpus.

Scale shape: ONE presence dedup (doc_id, term) shuffle feeds everything;
per-language counts are a map-side-combined aggregate; the per-term total
is a window over that AGGREGATED frame (<= n_langs rows per term key — the
window never sees document-sized groups); language totals and the corpus
total broadcast.  Winner selection is a rank-filtered window per language
key (WindowGroupLimit heaps), never a global sort.

Determinism discipline: chi2 is a RATIONAL function of exact integer
counts — no logs, no transcendentals — evaluated as the IDENTICAL
double-arithmetic expression tree on both engines (every IEEE multiply /
divide is correctly rounded, so identical inputs + identical tree =
bit-identical doubles), then snapped to the shared
``FLOOR(x * 1e6 + 0.5) / 1e6`` grid.

Reference contact: none (the reference is a per-document NER engine);
this extends the text-analysis family of operators/textops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CHI2_TOPK = 20
CHI2_DF_MIN = 5

_TOKEN_RE = "[a-z]+"

# the ONE chi2 expression both engines evaluate: N * (ad - bc)^2 /
# ((a+b)(c+d)(a+c)(b+d)), fully cast to DOUBLE leaf-by-leaf so the parse
# tree (and therefore every intermediate IEEE rounding) is identical
_CHI2_EXPR = (
    "CAST(n_total AS DOUBLE)"
    " * ((CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
    " - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    " * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
    " - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))"
    " / (((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))"
    " * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE)))"
    " * ((CAST(a AS DOUBLE) + CAST(c AS DOUBLE))"
    " * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE))))"
)
_CHI2_Q6 = f"FLOOR(({_CHI2_EXPR}) * 1000000 + 0.5) / 1000000"


def chi2_keywords(
    docs: DataFrame, k: int = CHI2_TOPK, df_min: int = CHI2_DF_MIN
) -> DataFrame:
    """Top-``k`` terms per language by chi-square document-presence
    association.  Output: (lang, rnk, term, n_docs, chi2)."""
    from .textops import fan_out

    docs = fan_out(docs)
    pres = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOKEN_RE), 0
                )
            ).alias("term"),
        )
        # one lang per doc, so (doc_id, term) keys presence
        .dropDuplicates(["doc_id", "term"])
    )
    a_f = pres.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("a"))
    # per-term corpus df: window over the AGGREGATED frame — <= n_langs
    # rows per term key, so the group is constant-bounded at any scale
    df_f = a_f.withColumn(
        "df_t", F.sum("a").over(Window.partitionBy("term"))
    )
    lang_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("docs_l"))
    n_tot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    x = (
        df_f.filter(F.col("df_t") >= df_min)
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        # drop degenerate margins (df_t == N or docs_l == N would zero a
        # denominator factor); both engines filter identically
        .filter(
            (F.col("df_t") < F.col("n_total"))
            & (F.col("docs_l") < F.col("n_total"))
        )
        .withColumn("b", F.col("docs_l") - F.col("a"))
        .withColumn("c", F.col("df_t") - F.col("a"))
        .withColumn(
            "d",
            F.col("n_total") - F.col("docs_l") - F.col("df_t") + F.col("a"),
        )
        .withColumn("chi2", F.expr(_CHI2_Q6))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("chi2").desc(), F.col("term")
    )
    return (
        x.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            "lang", "rnk", "term", F.col("a").alias("n_docs"), "chi2"
        )
    )


def chi2_keywords_sql(
    k: int = CHI2_TOPK,
    df_min: int = CHI2_DF_MIN,
    table: str = "documents",
) -> str:
    """DuckDB twin — same counts, same expression tree, same snap."""
    return f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, lang, term FROM (
        SELECT doc_id, lang,
               unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS term
        FROM {table})),
    a_f AS (SELECT lang, term, COUNT(*) AS a FROM pres GROUP BY 1, 2),
    d_f AS (SELECT *, SUM(a) OVER (PARTITION BY term) AS df_t FROM a_f),
    lt AS (SELECT lang, COUNT(*) AS docs_l FROM {table} GROUP BY 1),
    nt AS (SELECT COUNT(*) AS n_total FROM {table}),
    x AS (
      SELECT lang, term, a, docs_l - a AS b, df_t - a AS c,
             n_total - docs_l - df_t + a AS d, n_total
      FROM d_f JOIN lt USING (lang) CROSS JOIN nt
      WHERE df_t >= {df_min} AND df_t < n_total AND docs_l < n_total),
    s AS (
      SELECT lang, term, a, {_CHI2_Q6} AS chi2 FROM x),
    r AS (
      SELECT lang, term, a, chi2,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY chi2 DESC, term) AS BIGINT) AS rnk
      FROM s)
    SELECT lang, rnk, term, a AS n_docs, chi2
    FROM r WHERE rnk <= {k}
    """
