"""Exact distributed quantiles via value histograms — the scale-safe
percentile monitor a training-data pipeline runs over every corpus drop
(length/token distributions per language, the first thing that drifts
when an upstream crawler breaks).

Why not ``percentile`` / a global sort: an exact percentile over raw rows
either sorts the corpus or collects it.  Integer-valued metrics compress
losslessly into a (metric, value) -> count histogram first — one
map-side-combined aggregation whose output is bounded by the number of
DISTINCT values (<= max document length, independent of row count), so
at 100 TB the shuffle carries the compressed histogram, never the corpus.
The cumulative fold + quantile pick then run on that tiny frame (a
per-(lang, metric) window — partition size = distinct values, never rows).
Results are type-1 (lower-edge) quantiles: the smallest value whose
cumulative count reaches ``ceil(q * n / 100)`` — pure integer arithmetic
end to end, so the DuckDB twin is bit-exact with zero float discipline.

Reference contact: none (corpus monitoring is an engine extension in the
textops family; token expressions shared with operators/textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .parallelism import fan_out

QUANTILES = (50, 90, 99, 100)


def length_quantiles(docs_in: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """documents(lang, text) -> (lang, metric, q_pct, value): exact
    per-language type-1 quantiles of chars-per-doc and words-per-doc."""
    docs = fan_out(docs_in)
    chars = docs.select(
        "lang", F.lit("n_chars").alias("metric"),
        F.length(text_col).cast("long").alias("value"),
    )
    words = docs.select(
        "lang", F.lit("n_words").alias("metric"),
        F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"))
        .cast("long").alias("value"),
    )
    from ..cache import tracked_persist

    # hist feeds the cumulative window AND the totals agg — persist the
    # tiny histogram or the corpus-sized aggregation executes twice
    hist = tracked_persist(
        chars.unionByName(words)
        .groupBy("lang", "metric", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("lang", "metric").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("lang", "metric", "value",
                      F.sum("cnt").over(w).alias("cum"))
    tot = hist.groupBy("lang", "metric").agg(F.sum("cnt").alias("n"))
    qs = F.explode(
        F.array(*[F.lit(q) for q in QUANTILES])
    ).alias("q_pct")
    # integer ceil-division: float /100 + floor can mis-round on exact
    # multiples (double ulp), `div` keeps both engines in integers
    target = F.expr("(CAST(q_pct AS BIGINT) * n + 99) div 100")
    return (
        cum.join(tot, ["lang", "metric"])
        .select("lang", "metric", "value", "cum", "n", qs)
        .where(F.col("cum") >= target)
        .groupBy("lang", "metric", F.col("q_pct").cast("long").alias("q_pct"))
        .agg(F.min("value").alias("value"))
    )


def length_quantiles_sql() -> str:
    """DuckDB twin: identical histogram, cumulative fold, and ceil pick."""
    qvals = ", ".join(f"({q})" for q in QUANTILES)
    return rf"""
    WITH m AS (
      SELECT lang, 'n_chars' AS metric, length(text)::BIGINT AS value
      FROM documents
      UNION ALL
      SELECT lang, 'n_words' AS metric,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS value
      FROM documents),
    hist AS (
      SELECT lang, metric, value, COUNT(*) AS cnt
      FROM m GROUP BY lang, metric, value),
    cum AS (
      SELECT lang, metric, value,
             SUM(cnt) OVER (PARTITION BY lang, metric ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist),
    tot AS (SELECT lang, metric, SUM(cnt) AS n FROM hist
            GROUP BY lang, metric)
    SELECT c.lang, c.metric, q.q_pct::BIGINT AS q_pct,
           MIN(c.value) AS value
    FROM cum c
    JOIN tot t ON t.lang = c.lang AND t.metric = c.metric
    CROSS JOIN (VALUES {qvals}) q(q_pct)
    WHERE c.cum >= (q.q_pct::BIGINT * t.n + 99) // 100
    GROUP BY c.lang, c.metric, q.q_pct
    """


# ---------------------------------------------------------------------------
# IQR fence classification (outlier gate)
# ---------------------------------------------------------------------------

def iqr_classify(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Tukey-fence document classification: per language, exact type-1
    Q1/Q3 of chars-per-doc via the value-histogram trick (the only
    corpus-sized shuffle is the map-combined histogram agg), then every
    document is labeled 'lo' / 'in' / 'hi' against the k=1 integer fences
    ``[q1 - iqr, q3 + iqr]`` — the pre-training length gate that drops
    truncation stubs and concatenation blobs.  The 10-row fence frame
    broadcasts back onto the corpus; all arithmetic is integer, so the
    twin is bit-exact.  Output: (doc_id, lang, n_chars, q1, q3, side)."""
    docs = fan_out(docs_in).select(
        "doc_id", "lang", F.length(text_col).cast("long").alias("n_chars")
    )
    from ..cache import tracked_persist

    # two consumers (cum window + totals): persist the tiny histogram so
    # the corpus aggregation runs once
    hist = tracked_persist(
        docs.groupBy("lang", F.col("n_chars").alias("value")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    w = (
        Window.partitionBy("lang").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("lang", "value", F.sum("cnt").over(w).alias("cum"))
    tot = hist.groupBy("lang").agg(F.sum("cnt").alias("n"))
    qpick = (
        cum.join(tot, "lang")
        .select(
            "lang", "value", "cum", "n",
            F.explode(F.array(F.lit(25), F.lit(75))).alias("q_pct"),
        )
        .where(F.col("cum") >= F.expr("(CAST(q_pct AS BIGINT) * n + 99) div 100"))
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("q_pct") == 25, F.col("value"))).alias("q1"),
            F.min(F.when(F.col("q_pct") == 75, F.col("value"))).alias("q3"),
        )
    )
    side = (
        F.when(F.col("n_chars") < F.col("q1") - (F.col("q3") - F.col("q1")), "lo")
        .when(F.col("n_chars") > F.col("q3") + (F.col("q3") - F.col("q1")), "hi")
        .otherwise("in")
    )
    return docs.join(F.broadcast(qpick), "lang").select(
        "doc_id", "lang", "n_chars", "q1", "q3", side.alias("side")
    )


def iqr_classify_sql() -> str:
    """DuckDB twin of :func:`iqr_classify` (identical histogram quantile
    pick and integer fences)."""
    return r"""
    WITH v AS (
      SELECT doc_id, lang, length(text)::BIGINT AS n_chars FROM documents),
    hist AS (
      SELECT lang, n_chars AS value, COUNT(*) AS cnt
      FROM v GROUP BY lang, n_chars),
    cum AS (
      SELECT lang, value,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist),
    tot AS (SELECT lang, SUM(cnt) AS n FROM hist GROUP BY lang),
    qpick AS (
      SELECT c.lang,
             MIN(CASE WHEN q.q_pct = 25 THEN c.value END) AS q1,
             MIN(CASE WHEN q.q_pct = 75 THEN c.value END) AS q3
      FROM cum c JOIN tot t USING (lang)
      CROSS JOIN (VALUES (25), (75)) q(q_pct)
      WHERE c.cum >= (q.q_pct::BIGINT * t.n + 99) // 100
      GROUP BY c.lang)
    SELECT v.doc_id, v.lang, v.n_chars, q.q1, q.q3,
           CASE WHEN v.n_chars < q.q1 - (q.q3 - q.q1) THEN 'lo'
                WHEN v.n_chars > q.q3 + (q.q3 - q.q1) THEN 'hi'
                ELSE 'in' END AS side
    FROM v JOIN qpick q USING (lang)
    """
