"""BM25 retrieval and bigram-LM document scoring (round 3, session 5).

Two classic corpus-statistics operators a training-data pipeline needs on
top of the index/keyword family already in ``textops.py``:

* :func:`bm25_topk` — multi-query BM25 top-k retrieval over the documents
  table (Robertson/Sparck-Jones BM25, the Okapi formulation), the scoring
  stage that sits on top of :func:`~.textops.inverted_index`.
* :func:`bigram_lm_score` — per-document mean bigram conditional
  probability under the corpus's own bigram language model: the
  "perplexity-ish" fluency signal quality filters use (high = templated /
  predictable text, low = noise), without needing an external LM.

Float discipline (shared with ``textops.tfidf_topk`` /
``similarity.py``): every per-term / per-bigram score is snapped to an
integer micro-unit (``floor(x * 1e6 + 0.5)`` as BIGINT) *before* any
aggregation, so the cross-row SUM is exact integer arithmetic — immune to
float addition-order differences between Spark's partial aggregation and
DuckDB's — and the only float ops are division/multiplication chains
written with identical parenthesization on both sides (IEEE-identical).
BM25's idf uses the raw Robertson odds ratio ``(N - df + 0.5)/(df + 0.5)``
WITHOUT the usual log: log() bit-parity across libm implementations is not
guaranteed, and for ranking the monotone pre-log form orders identically.

Scale shape (100 TB): tokenization explodes map-side inside codegen; the
(doc, term) tf aggregation and the document-frequency aggregation are both
map-side combined; the query battery is a broadcast literal frame so the
candidate restriction happens BEFORE any shuffle of scores; top-k per
query compiles to Catalyst's WindowGroupLimit rewrite — a PARTIAL
per-map-task top-k heap below the exchange, then the final group limit —
so the full candidate set never shuffles.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from ..cache import tracked_persist
from .parallelism import fan_out
from .textops import STOPWORDS

# Okapi BM25 constants.  Written as literals on BOTH engine sides (never
# `k1 + 1` computed at runtime) so each parses to the identical double.
BM25_K1 = 1.2
BM25_K1_PLUS_1 = 2.2
BM25_B = 0.75
BM25_ONE_MINUS_B = 0.25
BM25_TOPK = 10

# The retrieval battery: small, fixed, broadcast.  Terms are drawn from
# the synthetic corpus vocabulary (TESTDATA.md) so every query matches.
BM25_QUERIES: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("q_hash_join", ("hash", "join")),
    ("q_window_agg", ("window", "agg", "sort")),
    ("q_stream_batch", ("stream", "batch")),
    ("q_table_scan", ("table", "scan")),
)

_TOKEN_RE = "[a-z]+"


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) stream — same tokenizer + stopword list as tfidf."""
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
        ).alias("term"),
    ).where(~F.col("term").isin(*STOPWORDS))


def bm25_topk(
    docs_in: DataFrame,
    text_col: str = "text",
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    Per matched (query, doc, term):

    ``idf = (N - df + 0.5) / (df + 0.5)``  (pre-log Robertson odds)
    ``tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))``
    ``micro = floor((idf * tfn) * 1e6 + 0.5)``  (BIGINT)

    and per (query, doc): ``score = sum(micro) / 1e6`` with ties broken by
    doc_id.  ``N``/``dl``/``avgdl`` count docs with >=1 post-stopword
    token, so both engines define the collection identically.

    Output: (query_id, doc_id, n_terms, score, rnk).
    """
    from pyspark.sql.window import Window

    spark = docs_in.sparkSession
    docs = fan_out(docs_in)

    # tf feeds dl, df and the scoring join — persist or the explode+count
    # stage re-executes once per consumer.
    tf = tracked_persist(
        _tokens(docs, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avgdl"),
    )

    qrows = [(qid, t) for qid, terms in queries for t in terms]
    qt = spark.createDataFrame(qrows, "query_id string, term string")
    qterms = qt.select("term").distinct()

    # Document frequency only for battery terms (broadcast semi-join keeps
    # the df agg restricted before it shuffles).
    dfreq = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    idf = (
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(BM25_K1_PLUS_1)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (
            F.lit(BM25_ONE_MINUS_B)
            + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.floor((idf * tfn) * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("micro"),
        )
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.sum("micro").cast("double") / F.lit(1000000.0)).alias("score"),
    )

    # Top-k per query: a rank-filtered window.  Catalyst's WindowGroupLimit
    # rewrite (rank-limit pushdown) inserts a PARTIAL group-limit below the
    # exchange, so each map task keeps only its local top-k heap — the
    # full candidate set never shuffles (plan-asserted in test_plans.py).
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_final).cast("long"))
        .where(F.col("rnk") <= k)
    )


def bm25_topk_sql(
    table: str = "documents",
    text_col: str = "text",
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk` — same tokenizer, stopword
    list, pre-log idf, literal constants, micro-int summation and
    tie-break."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in queries for t in terms
    )
    return f"""
    WITH qt(query_id, term) AS (VALUES {qvals}),
    toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower({text_col}), '{_TOKEN_RE}')) AS term
      FROM {table}),
    tf AS (
      SELECT doc_id, term, COUNT(*)::BIGINT AS tf
      FROM toks WHERE term NOT IN ({stop})
      GROUP BY doc_id, term),
    dl AS (SELECT doc_id, SUM(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*)::BIGINT AS n_docs,
             SUM(dl)::DOUBLE / COUNT(*)::DOUBLE AS avgdl
      FROM dl),
    dfreq AS (
      SELECT term, COUNT(*)::BIGINT AS df
      FROM tf
      WHERE term IN (SELECT DISTINCT term FROM qt)
      GROUP BY term),
    per_term AS (
      SELECT q.query_id, t.doc_id,
             CAST(FLOOR((
               ((s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * {BM25_K1_PLUS_1}) /
                  (t.tf + {BM25_K1} * ({BM25_ONE_MINUS_B}
                     + {BM25_B} * (l.dl / s.avgdl))))
             ) * 1000000.0 + 0.5) AS BIGINT) AS micro
      FROM tf t
      JOIN qt q USING (term)
      JOIN dfreq d USING (term)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s),
    scored AS (
      SELECT query_id, doc_id,
             COUNT(*)::BIGINT AS n_terms,
             SUM(micro)::DOUBLE / 1000000.0 AS score
      FROM per_term GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, n_terms, score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """


def bigram_lm_score(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document fluency under the corpus bigram LM.

    The model is the corpus itself: ``p(w2 | w1) = c(w1, w2) / c(w1, *)``
    where both counts range over bigram OCCURRENCES corpus-wide (so the
    denominator is exactly the sum of the numerators for a given ``w1`` —
    a proper conditional, no smoothing needed since every observed bigram
    has p > 0).  Each distinct per-doc bigram contributes
    ``cnt * floor(p * 1e6 + 0.5)`` to an exact BIGINT sum;

    ``lm_score = (sum_micro / n_bigrams) / 1e6``

    is the mean conditional probability of the document's transitions —
    the cheap stand-in for LM perplexity quality filters use.  Tokens keep
    stopwords (an LM wants function words).  Docs with < 2 tokens drop out
    (no transitions to score).

    Scale shape: bigram assembly is a codegen ``transform(sequence(...))``
    over the token array (zero shuffle), then three map-side-combined
    aggregations — per-doc bigram tf, corpus bigram counts, corpus
    unigram-prefix counts — and two equi-joins on (w1, w2)/(w1).  The
    per-doc tf frame is persisted because it feeds both corpus aggs and
    the final join.

    Output: (doc_id, n_bigrams, lm_micro_sum, lm_score).
    """
    docs = fan_out(docs_in)
    bi = (
        docs.select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
            ).alias("toks"),
        )
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS w1,"
                    "             element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    tfb = tracked_persist(
        bi.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    )
    c2 = tfb.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    c1 = tfb.groupBy("w1").agg(F.sum("cnt").alias("c1"))
    probs = c2.join(c1, "w1").select(
        "w1", "w2",
        F.floor(
            (F.col("c2").cast("double") / F.col("c1").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long").alias("p_micro"),
    )
    return (
        tfb.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("p_micro")).alias("lm_micro_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "lm_micro_sum",
            (
                (F.col("lm_micro_sum").cast("double")
                 / F.col("n_bigrams").cast("double"))
                / F.lit(1000000.0)
            ).alias("lm_score"),
        )
    )


def bigram_lm_score_sql(table: str = "documents",
                        text_col: str = "text") -> str:
    """DuckDB oracle twin of :func:`bigram_lm_score`."""
    return f"""
    WITH base AS (
      SELECT doc_id, regexp_extract_all(lower({text_col}), '{_TOKEN_RE}') AS toks
      FROM {table}),
    bi AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM base, UNNEST(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2),
    tfb AS (
      SELECT doc_id, w1, w2, COUNT(*)::BIGINT AS cnt
      FROM bi GROUP BY doc_id, w1, w2),
    c2 AS (SELECT w1, w2, SUM(cnt)::BIGINT AS c2 FROM tfb GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(cnt)::BIGINT AS c1 FROM tfb GROUP BY w1),
    probs AS (
      SELECT w1, w2,
             CAST(FLOOR((c2::DOUBLE / c1::DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS p_micro
      FROM c2 JOIN c1 USING (w1))
    SELECT t.doc_id,
           SUM(t.cnt)::BIGINT AS n_bigrams,
           SUM(t.cnt * p.p_micro)::BIGINT AS lm_micro_sum,
           (SUM(t.cnt * p.p_micro)::DOUBLE / SUM(t.cnt)::DOUBLE) / 1000000.0
             AS lm_score
    FROM tfb t JOIN probs p USING (w1, w2)
    GROUP BY t.doc_id
    """


# ---------------------------------------------------------------------------
# CCNet-style LM-quality buckets
# ---------------------------------------------------------------------------

def lm_quality_buckets(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek 2020): per language, documents
    split into head / middle / tail thirds by their bigram-LM fluency — the
    standard pre-filter that keeps the head for pretraining and drops the
    tail.

    The per-doc quality key is the INTEGER mean micro-probability
    ``lm_micro_sum div n_bigrams`` (floor division of two exact BIGINTs —
    no float ordering anywhere), and the per-language cut points are exact
    type-1 33/67-percentiles of that key via the value-histogram trick
    (the histogram shuffle is bounded by distinct key values, never rows).
    Cuts broadcast back onto the scored corpus.  Docs with < 2 tokens have
    no transitions and drop out, as in bigram_lm_score.
    Output: (doc_id, lang, q, c33, c67, bucket)."""
    from pyspark.sql.window import Window

    scores = bigram_lm_score(docs_in, text_col).select(
        "doc_id", F.expr("lm_micro_sum div n_bigrams").alias("q")
    )
    # scored feeds the cut-point histogram AND the final classification
    # join — persist or the whole bigram-LM stack executes twice; hist
    # likewise feeds the cum window + totals agg
    scored = tracked_persist(
        fan_out(docs_in).select("doc_id", "lang").join(scores, "doc_id")
    )
    hist = tracked_persist(
        scored.groupBy("lang", F.col("q").alias("value")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    w = (
        Window.partitionBy("lang").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select("lang", "value", F.sum("cnt").over(w).alias("cum"))
    tot = hist.groupBy("lang").agg(F.sum("cnt").alias("n"))
    cuts = (
        cum.join(tot, "lang")
        .select(
            "lang", "value",
            F.explode(F.array(F.lit(33), F.lit(67))).alias("q_pct"),
            "cum", "n",
        )
        .where(F.col("cum") >= F.expr("(CAST(q_pct AS BIGINT) * n + 99) div 100"))
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("q_pct") == 33, F.col("value"))).alias("c33"),
            F.min(F.when(F.col("q_pct") == 67, F.col("value"))).alias("c67"),
        )
    )
    bucket = (
        F.when(F.col("q") <= F.col("c33"), "tail")
        .when(F.col("q") <= F.col("c67"), "middle")
        .otherwise("head")
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "q", "c33", "c67", bucket.alias("bucket")
    )


def lm_quality_buckets_sql(table: str = "documents",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`lm_quality_buckets` (same integer key,
    histogram cuts, and boundary CASE)."""
    return f"""
    WITH lm AS ({bigram_lm_score_sql(table, text_col)}),
    scored AS (
      SELECT d.doc_id, d.lang, lm.lm_micro_sum // lm.n_bigrams AS q
      FROM {table} d JOIN lm ON d.doc_id = lm.doc_id),
    hist AS (
      SELECT lang, q AS value, COUNT(*) AS cnt FROM scored GROUP BY 1, 2),
    cum AS (
      SELECT lang, value,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY value
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist),
    tot AS (SELECT lang, SUM(cnt) AS n FROM hist GROUP BY lang),
    cuts AS (
      SELECT c.lang,
             MIN(CASE WHEN p.q_pct = 33 THEN c.value END) AS c33,
             MIN(CASE WHEN p.q_pct = 67 THEN c.value END) AS c67
      FROM cum c JOIN tot t USING (lang)
      CROSS JOIN (VALUES (33), (67)) p(q_pct)
      WHERE c.cum >= (p.q_pct::BIGINT * t.n + 99) // 100
      GROUP BY c.lang)
    SELECT s.doc_id, s.lang, s.q, cu.c33, cu.c67,
           CASE WHEN s.q <= cu.c33 THEN 'tail'
                WHEN s.q <= cu.c67 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scored s JOIN cuts cu USING (lang)
    """


# ---------------------------------------------------------------------------
# Hybrid retrieval: dense (hashed-embedding inner product) + BM25, RRF-fused
# ---------------------------------------------------------------------------

RRF_K = 60        # the standard reciprocal-rank-fusion constant
RRF_TOPK = 10


def query_hash_embeddings(
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    dim: int | None = None,
) -> list[tuple[str, list[int]]]:
    """Hash each battery query's terms into the SAME signed-bucket space
    as :mod:`featurehash` (md5-60 bucket, (h>>4)%2 sign) — no learned
    vocabulary, so query vectors are a pure function of the terms and both
    engines can embed them as literals."""
    from ..hashing import md5_60
    from .featurehash import HASH_DIM

    dim = dim or HASH_DIM
    out = []
    for qid, terms in queries:
        v = [0] * dim
        for t in terms:
            h = md5_60(t)
            v[h % dim] += ((h >> 4) % 2) * 2 - 1
        out.append((qid, v))
    return out


def dense_topk(
    docs_in: DataFrame,
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Dense retrieval leg: top-``k`` docs per query by EXACT inner
    product between the query's hashed embedding and each document's
    feature-hash embedding (MIPS — the scoring rule of inner-product dense
    retrievers).  All-integer arithmetic end to end (signed token counts),
    so scores are bit-exact across engines with no float discipline.

    Scale shape: the query battery is broadcast (fixed, tiny); the dot
    product is a codegen higher-order fold over the embedding array; the
    per-query top-k is a rank-filtered window that Catalyst rewrites with
    a partial group-limit below the exchange (only local heaps shuffle).
    Output: (query_id, doc_id, dot, rnk)."""
    from pyspark.sql.window import Window

    from .featurehash import feature_hash_embed

    spark = docs_in.sparkSession
    emb = feature_hash_embed(docs_in)
    q = spark.createDataFrame(
        query_hash_embeddings(queries),
        "query_id string, q_emb array<bigint>",
    )
    dot = F.aggregate(
        F.zip_with("embedding", "q_emb", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "query_id", "doc_id", dot.alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def rrf_fusion(
    docs_in: DataFrame,
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
    rrf_k: int = RRF_K,
    topk: int = RRF_TOPK,
) -> DataFrame:
    """Hybrid sparse+dense retrieval via reciprocal-rank fusion
    (Cormack et al. SIGIR'09): fuse the BM25 top-``k`` list and the
    hashed-embedding inner-product top-``k`` list per query with

        ``rrf = sum over rankers of 1 / (rrf_k + rank)``

    (a ranker not returning the doc contributes 0 — standard top-k RRF),
    then keep the fused top-``topk``.  Rank reciprocals are IEEE-exact
    identical across engines (integer + integer division); the emitted
    score snaps to the shared floor(x*1e8+0.5)/1e8 grid.

    Scale shape: both legs end rank-bounded (<= k rows per query), so the
    fusion join and final window run over battery_size * k rows — bounded
    regardless of corpus size; all heavy lifting stays inside the two
    rankers.  Output: (query_id, doc_id, bm_rnk, dense_rnk, rrf, rnk)
    with absent-ranker ranks reported as 0."""
    from pyspark.sql.window import Window

    bm = bm25_topk(docs_in, queries=queries, k=k).select(
        "query_id", "doc_id", F.col("rnk").alias("bm_rnk")
    )
    dn = dense_topk(docs_in, queries=queries, k=k).select(
        "query_id", "doc_id", F.col("rnk").alias("dense_rnk")
    )
    fused = bm.join(dn, ["query_id", "doc_id"], "full_outer")
    raw = (
        F.when(F.col("bm_rnk").isNull(), F.lit(0.0)).otherwise(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("bm_rnk"))
        )
        + F.when(F.col("dense_rnk").isNull(), F.lit(0.0)).otherwise(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rnk"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_raw"), F.asc("doc_id"))
    return (
        fused.withColumn("_raw", raw)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .select(
            "query_id", "doc_id",
            F.coalesce("bm_rnk", F.lit(0)).cast("long").alias("bm_rnk"),
            F.coalesce("dense_rnk", F.lit(0)).cast("long").alias("dense_rnk"),
            (F.floor(F.col("_raw") * F.lit(100000000.0) + F.lit(0.5))
             / F.lit(100000000.0)).alias("rrf"),
            "rnk",
        )
    )


def rrf_fusion_sql(
    table: str = "documents",
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
    rrf_k: int = RRF_K,
    topk: int = RRF_TOPK,
) -> str:
    """DuckDB twin: BM25 leg via :func:`bm25_topk_sql`, dense leg from the
    feature-hash embedding replayed in SQL with the SAME literal query
    vectors, identical fusion arithmetic."""
    from .featurehash import HASH_DIM, feature_hash_embed_sql

    qv_rows = ", ".join(
        "('" + qid + "', [" + ", ".join(str(x) for x in vec) + "])"
        for qid, vec in query_hash_embeddings(queries)
    )
    return f"""
    WITH bm AS (
      SELECT query_id, doc_id, rnk AS bm_rnk
      FROM ({bm25_topk_sql(table)})),
    emb AS ({feature_hash_embed_sql(table)}),
    qv (query_id, q_emb) AS (VALUES {qv_rows}),
    dot AS (
      SELECT q.query_id, e.doc_id,
             SUM(e.embedding[g.i + 1] * q.q_emb[g.i + 1])::BIGINT AS dot
      FROM emb e CROSS JOIN qv q CROSS JOIN range({HASH_DIM}) g(i)
      GROUP BY 1, 2),
    dn AS (
      SELECT query_id, doc_id, dense_rnk FROM (
        SELECT query_id, doc_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY dot DESC, doc_id
               ) AS dense_rnk
        FROM dot)
      WHERE dense_rnk <= {k}),
    fused AS (
      SELECT COALESCE(b.query_id, d.query_id) AS query_id,
             COALESCE(b.doc_id, d.doc_id) AS doc_id,
             b.bm_rnk AS bm_rnk0, d.dense_rnk AS dense_rnk0,
             (CASE WHEN b.bm_rnk IS NULL THEN 0.0
                   ELSE 1.0 / ({rrf_k} + b.bm_rnk) END
              + CASE WHEN d.dense_rnk IS NULL THEN 0.0
                     ELSE 1.0 / ({rrf_k} + d.dense_rnk) END) AS raw
      FROM bm b FULL OUTER JOIN dn d
        ON b.query_id = d.query_id AND b.doc_id = d.doc_id)
    SELECT query_id, doc_id,
           COALESCE(bm_rnk0, 0)::BIGINT AS bm_rnk,
           COALESCE(dense_rnk0, 0)::BIGINT AS dense_rnk,
           floor(raw * 100000000.0 + 0.5) / 100000000.0 AS rrf,
           rnk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY raw DESC, doc_id
             )::BIGINT AS rnk
      FROM fused)
    WHERE rnk <= {topk}
    """


# ---------------------------------------------------------------------------
# Sparse-vs-dense rank agreement (Kendall tau over the shared top-k)
# ---------------------------------------------------------------------------

def rank_correlation(
    docs_in: DataFrame,
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Kendall tau-a between the BM25 and dense-MIPS rankings over each
    query's SHARED top-``k`` documents — the ranker-agreement statistic
    that tells a retrieval stack whether its two legs disagree enough for
    fusion to matter (tau near 1: the dense leg adds nothing; tau near
    0/negative: RRF is load-bearing).

    Exact end to end: concordant/discordant are integer counts over all
    doc pairs ranked by both legs, and

        ``tau_micro = floor(1e6 * (C - D) / (n*(n-1)/2))``

    is one double division of identical integers (``n_pairs`` =
    ``n_common*(n_common-1)/2``; no rank ties are possible under
    row_number, so tau-a needs no tie correction).  Scale shape: both
    leg outputs are rank-bounded (<= k rows/query), so the pair
    self-join touches <= k^2 rows per query regardless of corpus size;
    queries with fewer than 2 shared docs have no pairs and are
    excluded.  Output: (query_id, n_common, n_pairs, concordant,
    discordant, tau_micro)."""
    bm = bm25_topk(docs_in, queries=queries, k=k).select(
        "query_id", "doc_id", F.col("rnk").alias("r_bm")
    )
    dn = dense_topk(docs_in, queries=queries, k=k).select(
        "query_id", "doc_id", F.col("rnk").alias("r_dn")
    )
    common = bm.join(dn, ["query_id", "doc_id"])
    a, b = common.alias("a"), common.alias("b")
    pairs = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        (
            (F.col("a.r_bm") - F.col("b.r_bm"))
            * (F.col("a.r_dn") - F.col("b.r_dn"))
            > 0
        ).cast("long").alias("conc"),
    )
    counts = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").alias("concordant"),
    )
    sizes = common.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    tau = F.floor(
        F.lit(1000000)
        * (F.col("concordant") - F.col("discordant"))
        / F.col("n_pairs")
    ).cast("long")
    return (
        counts.withColumn(
            "discordant", F.col("n_pairs") - F.col("concordant")
        )
        .join(sizes, "query_id")
        .select(
            "query_id", "n_common", "n_pairs", "concordant", "discordant",
            tau.alias("tau_micro"),
        )
    )


def rank_correlation_sql(
    table: str = "documents",
    queries: Sequence[Tuple[str, Sequence[str]]] = BM25_QUERIES,
    k: int = BM25_TOPK,
) -> str:
    """DuckDB twin: same two leg rankings, same integer concordance."""
    from .featurehash import HASH_DIM, feature_hash_embed_sql

    qv_rows = ", ".join(
        "('" + qid + "', [" + ", ".join(str(x) for x in vec) + "])"
        for qid, vec in query_hash_embeddings(queries)
    )
    return f"""
    WITH bm AS (
      SELECT query_id, doc_id, rnk AS r_bm
      FROM ({bm25_topk_sql(table)})),
    emb AS ({feature_hash_embed_sql(table)}),
    qv (query_id, q_emb) AS (VALUES {qv_rows}),
    dot AS (
      SELECT q.query_id, e.doc_id,
             SUM(e.embedding[g.i + 1] * q.q_emb[g.i + 1])::BIGINT AS dot
      FROM emb e CROSS JOIN qv q CROSS JOIN range({HASH_DIM}) g(i)
      GROUP BY 1, 2),
    dn AS (
      SELECT query_id, doc_id, r_dn FROM (
        SELECT query_id, doc_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY dot DESC, doc_id
               ) AS r_dn
        FROM dot)
      WHERE r_dn <= {k}),
    common AS (
      SELECT bm.query_id, bm.doc_id, bm.r_bm, dn.r_dn
      FROM bm JOIN dn USING (query_id, doc_id)),
    pairs AS (
      SELECT a.query_id,
             CASE WHEN (a.r_bm - b.r_bm) * (a.r_dn - b.r_dn) > 0
                  THEN 1 ELSE 0 END AS conc
      FROM common a JOIN common b
        ON a.query_id = b.query_id AND a.doc_id < b.doc_id),
    counts AS (
      SELECT query_id, COUNT(*)::BIGINT AS n_pairs,
             SUM(conc)::BIGINT AS concordant
      FROM pairs GROUP BY 1),
    sizes AS (
      SELECT query_id, COUNT(*)::BIGINT AS n_common FROM common GROUP BY 1)
    SELECT c.query_id, s.n_common, c.n_pairs, c.concordant,
           (c.n_pairs - c.concordant)::BIGINT AS discordant,
           FLOOR(1000000 * (c.concordant - (c.n_pairs - c.concordant))
                 / c.n_pairs)::BIGINT AS tau_micro
    FROM counts c JOIN sizes s USING (query_id)
    """
