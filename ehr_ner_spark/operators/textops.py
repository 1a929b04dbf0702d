"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.  All hot paths are
JVM-side built-ins (regex/string/agg expressions inside whole-stage codegen);
no Python anywhere — language ID included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallelism import fan_out

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# BPE-ish token regex: alpha runs, single digits, single punct
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f]"  # explicit RE2 \s set (Java \s adds \x0b)


def token_stats(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counting (pure built-ins)."""
    docs = fan_out(docs_in)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+")).alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score (all built-ins,
    pushdown-friendly): word count, mean word length, stopword ratio, digit
    ratio, punctuation ratio."""
    docs = fan_out(docs_in)
    words = F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_digit = F.regexp_count(F.col(text_col), F.lit(r"[0-9]"))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9 \t\n\r\f]"))
    n_chars = F.length(text_col)
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(n_chars / n_words, 6).alias("mean_word_len"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
        F.round(n_digit / n_chars, 6).alias("digit_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
    )
    score = (
        F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("digit_ratio") * 10.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.15
    )
    return out.withColumn("quality", F.round(score, 6))


def fingerprint(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of whitespace-normalized
    lowercase content + a positional 8-gram rolling-window min-hash
    ("winnowing"-style), both built-ins.  Words are hashed once
    (xxhash64) and each window folds 8 longs (polynomial combine) —
    no per-window string materialization; the normalized text and word-hash
    array are staged through separate projections so they are computed once
    per row."""
    # word hashes bounded to 2^55 and the fold reduced mod 2^55 each step:
    # |acc*31 + x| < 2^61, so the polynomial combine can never overflow
    # int64 (Spark 4 ANSI mode turns silent wraparound into a hard error)
    _m = 1 << 55
    docs = fan_out(docs_in)
    staged = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col(text_col)), r"[ \t\n\r\f]+", " ").alias("norm"),
    ).select(
        "doc_id",
        "norm",
        F.transform(
            F.split("norm", " "), lambda w: F.pmod(F.xxhash64(w), F.lit(_m))
        ).alias("wh"),
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("wh") - 8, F.lit(0))),
        lambda i: F.aggregate(
            F.slice("wh", i + 1, 8),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % F.lit(_m),
        ),
    )
    return staged.select(
        "doc_id",
        F.md5("norm").alias("md5_fp"),
        F.array_min(grams).alias("winnow_fp"),
    )


# Language-ID heuristic: per-language evidence = marker-stopword hits
# (weight 1) + diacritic/script char-class hits (weight 2; CJK weight 3),
# normalized per char into parts-per-million.  Both the Spark expression
# tree and the DuckDB oracle SQL are generated from this one table, so the
# heuristic is pure JVM built-ins (regexp_count inside codegen — no Python)
# AND exactly SQL-oracle-checkable.  Patterns are shared Java-regex/RE2
# syntax (alternation, \b, literal char classes only).
LANG_MARKERS: dict[str, tuple[str | None, str | None, int]] = {
    # lang -> (word-marker regex on lower(text), char-class regex, char weight)
    "de": (r"\b(?:der|die|das|und|ist|nicht|mit|ein|zu|den)\b", "[äöüß]", 2),
    "en": (r"\b(?:the|and|of|is|in|to|it|that|with|for)\b", None, 0),
    "es": (r"\b(?:el|los|las|es|una|que|para|con|por|y)\b", "[áéíóúñ¿¡]", 2),
    "fr": (r"\b(?:le|la|les|des|est|et|une|que|pour|dans)\b", "[àâçéèêëîïôùû]", 2),
    "zh": (None, "[一-鿿]", 3),
}


def lang_id(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic (deterministic stand-in for a fastText-style
    classifier).  Output: (doc_id, lang_pred, conf_ppm) where conf_ppm =
    floor(evidence * 1e6 / n_chars).  Ties break alphabetically."""
    docs = fan_out(docs_in)
    low = F.lower(F.col(text_col))
    n = F.greatest(F.length(text_col), F.lit(1))
    scores = {}
    for lang in sorted(LANG_MARKERS):
        wp, cp, cw = LANG_MARKERS[lang]
        hits = F.lit(0)
        if wp is not None:
            hits = hits + F.regexp_count(low, F.lit(wp))
        if cp is not None:
            hits = hits + F.lit(cw) * F.regexp_count(F.col(text_col), F.lit(cp))
        scores[lang] = F.floor(hits * F.lit(1000000.0) / n)
    best = F.greatest(*scores.values())
    pred = F
    for lang in sorted(scores):  # alphabetical => deterministic tie-break
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("conf_ppm"),
    )


def lang_id_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle twin of :func:`lang_id`, generated from LANG_MARKERS."""
    exprs = []
    for lang in sorted(LANG_MARKERS):
        wp, cp, cw = LANG_MARKERS[lang]
        parts = []
        if wp is not None:
            parts.append(f"len(regexp_extract_all(lower({text_col}), '{wp}'))")
        if cp is not None:
            parts.append(f"{cw} * len(regexp_extract_all({text_col}, '{cp}'))")
        hits = " + ".join(parts)
        exprs.append(
            f"FLOOR(({hits}) * 1000000.0 / GREATEST(length({text_col}), 1))"
            f"::BIGINT AS s_{lang}"
        )
    score_cols = ",\n         ".join(exprs)
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    case = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    return f"""
    WITH scored AS (
      SELECT doc_id,
         {score_cols}
      FROM {table}),
    m AS (SELECT *, {best} AS best FROM scored)
    SELECT doc_id, CASE {case} END AS lang_pred, best AS conf_ppm
    FROM m
    """


# --- PII scrubbing (pure built-ins; patterns shared Java-regex/RE2 syntax:
# ASCII classes, \b word boundaries — identical semantics in both engines)
PII_PATTERNS = (
    # (name, pattern, replacement) — applied IN ORDER on both engines
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrubbing: emails, phone-shaped numbers and IPv4
    literals replaced by typed placeholders; per-class hit counts emitted
    for audit.  Counts are taken BEFORE any replacement (placeholders can
    never feed a later pattern), then the replacements apply in the fixed
    PII_PATTERNS order — the same sequence the DuckDB oracle runs.
    Output: (doc_id, clean_text, n_email, n_phone, n_ipv4)."""
    docs = fan_out(docs_in)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select("doc_id", clean.alias("clean_text"), *counts)


def repetition_stats(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition signals: the fraction of word bigrams
    taken by the single most frequent bigram, plus distinct-word ratio.
    Documents dominated by one repeated phrase (boilerplate, scraped
    navigation) score high top_bigram_ratio / low distinct_word_ratio.
    Exploded bigrams -> per-(doc, gram) counts (map-side partial agg) ->
    per-doc max/sum — two key-local shuffles, no skew (keys are doc-local).
    Output: (doc_id, n_bigrams, top_bigram_ratio, distinct_word_ratio)."""
    docs = fan_out(docs_in)
    words = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_w")
    )
    grams = words.select(
        "doc_id",
        F.size("_w").alias("n_words"),
        F.size(F.array_distinct("_w")).alias("n_distinct_words"),
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - 2),
                    lambda i: F.concat_ws(" ", F.element_at("_w", i + 1),
                                          F.element_at("_w", i + 2)),
                ),
            ).otherwise(F.array(F.lit("")))
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "n_words", "n_distinct_words", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_gram.groupBy("doc_id", "n_words", "n_distinct_words")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(F.col("top_c") / F.col("n_bigrams"), 6).alias("top_bigram_ratio"),
            F.round(
                F.col("n_distinct_words") / F.col("n_words"), 6
            ).alias("distinct_word_ratio"),
        )
    )


# DuckDB twin of :func:`quality_scores` (also reused by the curation-funnel
# oracle) — kept next to the engine expressions it mirrors.
QUALITY_SQL = r"""
    WITH base AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS words,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit,
             len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
      FROM documents),
    feat AS (
      SELECT doc_id,
             len(words) AS n_words,
             ROUND(n_chars / CAST(len(words) AS DOUBLE), 6) AS mean_word_len,
             ROUND(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is','it','for','on')))
                   / CAST(len(words) AS DOUBLE), 6) AS stopword_ratio,
             ROUND(n_digit / CAST(n_chars AS DOUBLE), 6) AS digit_ratio,
             ROUND(n_punct / CAST(n_chars AS DOUBLE), 6) AS punct_ratio
      FROM base)
    SELECT *,
           ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
               + LEAST(stopword_ratio * 5.0, 1.0) * 0.3
               + (1.0 - LEAST(digit_ratio * 10.0, 1.0)) * 0.15
               + (1.0 - LEAST(punct_ratio * 10.0, 1.0)) * 0.15, 6) AS quality
    FROM feat
    """


# --- tf-idf keyword extraction (round 3) -----------------------------------

TFIDF_K = 5


def tfidf_topk(docs_in: DataFrame, text_col: str = "text",
               k: int = TFIDF_K) -> DataFrame:
    """Per-document top-k keywords by tf-idf — the keyword/topic-tagging
    stage of a curation pipeline, pure built-ins end to end.

    Scale shape: explode -> ONE (doc_id, term) count shuffle (map-side
    combined) -> term-keyed document-frequency agg (map-side combined) ->
    1:1 equi-join of df back onto the tf frame (no row amplification, so a
    Zipf head term only imbalances partition sizes — AQE splits those) ->
    doc-local window top-k (skew-free keys).  The idf is the rational
    (N+1)/(df+1) rather than a log so the score is a product/quotient of
    exactly-representable ints — IEEE-identical in any engine — and then
    snapped to the shared floor(x*1e6+0.5)/1e6 grid (log() bit-parity
    across libm implementations is NOT guaranteed; the rational form ranks
    identically).  Output: (doc_id, term, tf, df, score, rnk).
    """
    from pyspark.sql.window import Window

    from ..cache import tracked_persist

    docs = fan_out(docs_in)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("term"),
    ).where(~F.col("term").isin(*STOPWORDS))
    # tf feeds both the df aggregation and the score join — persist or the
    # explode+count re-executes per consumer
    tf = tracked_persist(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    raw = F.col("tf").cast("double") * (
        (F.col("n_docs") + F.lit(1)).cast("double")
        / ((F.col("df") + F.lit(1)).cast("double"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf", "df",
            (F.floor(raw * F.lit(1000000.0) + F.lit(0.5))
             / F.lit(1000000.0)).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def tfidf_topk_sql(table: str = "documents", text_col: str = "text",
                   k: int = TFIDF_K) -> str:
    """DuckDB oracle twin of :func:`tfidf_topk` (same tokenizer, stopword
    list, rational idf and 1e-6 snap)."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower({text_col}), '[a-z]+')) AS term
      FROM {table}),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term NOT IN ({stop})
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM {table}),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             FLOOR(t.tf::DOUBLE * ((n.n_docs + 1)::DOUBLE / (d.df + 1)::DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
      FROM scored)
    WHERE rnk <= {k}
    """


# --- corpus boilerplate n-gram mining (round 3) -----------------------------

BOILERPLATE_N = 5
BOILERPLATE_TOP = 20


def boilerplate_ngrams(docs_in: DataFrame, text_col: str = "text",
                       n: int = BOILERPLATE_N,
                       top: int = BOILERPLATE_TOP) -> DataFrame:
    """Corpus-level boilerplate mining: the `top` word n-grams that appear
    in the most documents (scraped navigation, license banners, templated
    headers — the phrases a C4-style cleaner strips corpus-wide).

    Per-doc grams are DISTINCT (document frequency, not raw frequency, is
    the boilerplate signal), built with array built-ins inside codegen —
    no Python.  Two shuffles: the (doc_id, gram) distinct and the gram
    count (both map-side combined); the global top-`top` is orderBy+limit
    (TakeOrderedAndProject per-partition heaps — the gram vocabulary at
    corpus scale is far too large for a single-partition window), then the
    rnk column comes from a window over the <=`top`-row winner frame.
    Output: (gram, n_docs, rnk).
    """
    from pyspark.sql.window import Window

    docs = fan_out(docs_in)
    words = docs.select(
        "doc_id",
        F.split(
            F.regexp_replace(
                F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f]+", " "
            ),
            " ",
        ).alias("w"),
    )
    grams = words.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (n - 1)),
                    lambda i: F.array_join(F.slice("w", i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    ).distinct()
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    winners = counts.orderBy(F.desc("n_docs"), F.asc("gram")).limit(top)
    w = Window.orderBy(F.desc("n_docs"), F.asc("gram"))
    return winners.withColumn("rnk", F.row_number().over(w).cast("long"))


def boilerplate_ngrams_sql(table: str = "documents", text_col: str = "text",
                           n: int = BOILERPLATE_N,
                           top: int = BOILERPLATE_TOP) -> str:
    """DuckDB oracle twin of :func:`boilerplate_ngrams` (same normalizer,
    1-based inclusive slicing, DISTINCT-per-doc semantics)."""
    return f"""
    WITH w AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim({text_col})),
                                         '[ \t\n\r\f]+', ' ', 'g'), ' ') AS w
      FROM {table}),
    g AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+{n - 1}], ' ') AS gram
      FROM w, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}),
    c AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram)
    SELECT gram, n_docs, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, gram ASC) AS rnk
      FROM c)
    WHERE rnk <= {top}
    """


IDX_TOP_TERMS = 100
IDX_POSTING_CAP = 20


def inverted_index(docs_in: DataFrame, text_col: str = "text",
                   top: int = IDX_TOP_TERMS,
                   cap: int = IDX_POSTING_CAP) -> DataFrame:
    """Search-index construction: the top-``top`` vocabulary terms by
    document frequency with a capped, sorted posting list each — the
    build step of a keyword retrieval index over the corpus.

    Scale shape: ONE distinct (doc_id, term) shuffle (map-side combined)
    -> term-keyed df agg (map-side combined) -> global top-``top`` via
    orderBy+limit, which Catalyst plans as TakeOrderedAndProject (per-
    partition heaps + a ``top``-row gather; NO single-partition window)
    -> postings truncated per term by a BROADCAST semi-join against the
    winner set BEFORE any list materializes, so a Zipf head term collects
    at most ``cap`` doc ids, never its full million-doc posting.  The rnk
    column comes from a window over the ``top``-row winner frame only.
    Output: (term, df, rnk, postings array<doc_id>).
    """
    from pyspark.sql.window import Window

    from ..cache import tracked_persist

    docs = fan_out(docs_in)
    posting = tracked_persist(
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
                )
            ).alias("term"),
        )
        .where(~F.col("term").isin(*STOPWORDS))
        .distinct()
    )
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    winners = dfreq.orderBy(F.desc("df"), F.asc("term")).limit(top)
    ranked = winners.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.desc("df"), F.asc("term"))
        ).cast("long"),
    )
    capped = (
        posting.join(F.broadcast(ranked.select("term")), "term")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("term").orderBy("doc_id")
            ),
        )
        .where(F.col("rn") <= cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return ranked.join(capped, "term").select("term", "df", "rnk", "postings")


def inverted_index_sql(table: str = "documents", text_col: str = "text",
                       top: int = IDX_TOP_TERMS,
                       cap: int = IDX_POSTING_CAP) -> str:
    """DuckDB twin of :func:`inverted_index` (same tokenizer, stopwords,
    df tie-break, posting cap and ordering)."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH posting AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(regexp_extract_all(lower({text_col}), '[a-z]+')) AS term
        FROM {table})
      WHERE term NOT IN ({stop})),
    dfreq AS (SELECT term, COUNT(*) AS df FROM posting GROUP BY term),
    ranked AS (
      SELECT term, df, ROW_NUMBER() OVER (
        ORDER BY df DESC, term ASC) AS rnk
      FROM dfreq QUALIFY rnk <= {top}),
    capped AS (
      SELECT term, list(doc_id ORDER BY doc_id) AS postings FROM (
        SELECT p.term, p.doc_id, ROW_NUMBER() OVER (
          PARTITION BY p.term ORDER BY p.doc_id) AS rn
        FROM posting p JOIN ranked r ON r.term = p.term)
      WHERE rn <= {cap}
      GROUP BY term)
    SELECT r.term, r.df, r.rnk, c.postings
    FROM ranked r JOIN capped c ON c.term = r.term
    """


CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def chunk_documents(docs_in: DataFrame, size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE,
                    text_col: str = "text") -> DataFrame:
    """Sliding-window document chunking — the RAG / long-context prep op:
    split every document into ``size``-char windows every ``stride`` chars
    (so consecutive chunks overlap by ``size - stride``), keeping the final
    short tail.

    All array/substring built-ins inside whole-stage codegen: the chunk
    START OFFSETS are generated as a sequence and exploded BEFORE the
    substring is cut, so no executor ever materializes a document's full
    chunk array in one row — the explode output is pipelined straight into
    the (narrow) substring projection.  No shuffle at all: chunking is
    embarrassingly row-local; downstream consumers impose their own
    partitioning.  Output: (doc_id, chunk_id, n_chunks, chunk_start,
    chunk_text) with 1-based chunk_start (SQL substring convention).
    """
    docs = fan_out(docs_in)
    n = F.greatest(
        F.lit(1),
        (F.ceil(
            (F.length(F.col(text_col)) - F.lit(size)).cast("double")
            / F.lit(stride)
        ) + F.lit(1)).cast("long"),
    )
    return (
        docs.select(
            "doc_id",
            F.col(text_col).alias("_t"),
            n.alias("n_chunks"),
        )
        .select(
            "doc_id", "n_chunks", "_t",
            F.explode(
                F.sequence(F.lit(0), F.col("n_chunks") - 1)
            ).alias("_i"),
        )
        .select(
            "doc_id",
            (F.col("_i") + 1).cast("long").alias("chunk_id"),
            F.col("n_chunks"),
            (F.col("_i") * stride + 1).cast("long").alias("chunk_start"),
            F.substring(
                F.col("_t"), (F.col("_i") * stride + 1).cast("int"), size
            ).alias("chunk_text"),
        )
    )


def chunk_documents_sql(table: str = "documents", size: int = CHUNK_SIZE,
                        stride: int = CHUNK_STRIDE,
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`chunk_documents` (same count formula, same
    1-based substring semantics)."""
    return f"""
    WITH base AS (
      SELECT doc_id, {text_col} AS t,
             GREATEST(1, CEIL((length({text_col}) - {size})::DOUBLE
                              / {stride})::BIGINT + 1) AS n_chunks
      FROM {table})
    SELECT doc_id,
           (i + 1)::BIGINT                 AS chunk_id,
           n_chunks,
           (i * {stride} + 1)::BIGINT      AS chunk_start,
           substring(t, (i * {stride} + 1)::INT, {size}) AS chunk_text
    FROM base, LATERAL UNNEST(range(0, n_chunks)) AS u(i)
    """


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage (OOV-rate report)
# ---------------------------------------------------------------------------

VOCAB_K = 100


def vocab_coverage(docs_in: DataFrame, text_col: str = "text",
                   k: int = VOCAB_K) -> DataFrame:
    """Per-language OOV report against a corpus-learned top-k vocabulary:
    how much of each language's token mass a k-entry vocab covers — the
    go/no-go check before freezing a tokenizer for pretraining.

    Scale shape: the corpus is tokenized ONCE into (lang, word) counts
    (map-side combined — the only corpus-sized shuffle); the global vocab
    reduces that small frame again and takes top-k via orderBy+limit
    (TakeOrderedAndProject: per-partition heaps, never a global window);
    coverage is a BROADCAST left join of the k-row vocab back onto the
    per-language counts.  All-integer output — bit-exact in any engine.
    Tokens are RE2-whitespace-split, the simhash/fingerprint discipline.
    Output: (lang, total_tokens, covered_tokens, distinct_tokens,
    covered_distinct)."""
    from ..cache import tracked_persist

    words = fan_out(docs_in).select(
        "lang",
        F.explode(
            F.split(F.col(text_col), "[ \t\n\r\f]+")
        ).alias("w"),
    ).where(F.col("w") != "")
    # lw feeds both the vocab reduction and the coverage join
    lw = tracked_persist(
        words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    )
    wc = lw.groupBy("w").agg(F.sum("c").alias("tot"))
    vocab = wc.orderBy(F.desc("tot"), F.asc("w")).limit(k).select(
        "w", F.lit(True).alias("in_vocab")
    )
    cov = lw.join(F.broadcast(vocab), "w", "left")
    return cov.groupBy("lang").agg(
        F.sum("c").alias("total_tokens"),
        F.sum(F.when(F.col("in_vocab"), F.col("c")).otherwise(F.lit(0)))
        .alias("covered_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.count("in_vocab").alias("covered_distinct"),
    )


def vocab_coverage_sql(table: str = "documents", text_col: str = "text",
                       k: int = VOCAB_K) -> str:
    """DuckDB twin of :func:`vocab_coverage` (same tokenizer, same
    (count DESC, word ASC) vocab order, same integer outputs)."""
    return f"""
    WITH words AS (
      SELECT lang, unnest(string_split_regex({text_col}, '\\s+')) AS w
      FROM {table}),
    lw AS (
      SELECT lang, w, COUNT(*)::BIGINT AS c
      FROM words WHERE w <> '' GROUP BY 1, 2),
    wc AS (SELECT w, SUM(c) AS tot FROM lw GROUP BY 1),
    vocab AS (SELECT w FROM wc ORDER BY tot DESC, w LIMIT {k})
    SELECT lang,
           SUM(c)::BIGINT AS total_tokens,
           SUM(CASE WHEN v.w IS NOT NULL THEN c ELSE 0 END)::BIGINT
             AS covered_tokens,
           COUNT(*)::BIGINT AS distinct_tokens,
           COUNT(v.w)::BIGINT AS covered_distinct
    FROM lw LEFT JOIN vocab v USING (w)
    GROUP BY lang
    """


ENTROPY_LOW_BITS = 3.2   # below: repeated-alphabet boilerplate / gibberish
ENTROPY_HIGH_BITS = 5.5  # above: near-uniform noise (e.g. base64 blobs)


def char_entropy(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-level Shannon entropy (bits/char) — the classic gibberish /
    binary-blob gate a curation pipeline runs before any model-based filter.

    Fully map-side: the char histogram is built per-document with
    higher-order array functions (``transform`` over ``array_distinct`` +
    ``filter``) — O(d*n) per doc with d bounded by the alphabet (<~100), no
    explode (a char-explode would emit one ROW per character: a 100x row
    amplification crossing the agg exchange at corpus scale), no shuffle at
    all.  Entropy uses the shuffle-free identity
    ``H = (ln n - sum(c*ln c)/n) / ln 2`` over exact integer counts, so the
    only floats are ln's of integers — IEEE-identical across engines.
    Output: (doc_id, n_chars, n_distinct_chars, entropy_bits, entropy_gate).
    """
    docs = fan_out(docs_in)
    cs = F.split(F.col(text_col), "")
    counts = F.transform(
        F.array_distinct(cs),
        lambda c: F.size(F.filter(cs, lambda y: y == c)),
    )
    s = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    n = F.length(text_col).cast("double")
    h = (F.log(n) - s / n) / F.log(F.lit(2.0))
    h6 = F.floor(h * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    gate = (
        F.when(h6 < ENTROPY_LOW_BITS, F.lit("low_entropy"))
        .when(h6 > ENTROPY_HIGH_BITS, F.lit("high_entropy"))
        .otherwise(F.lit("ok"))
    )
    return docs.where(F.length(text_col) > 0).select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(F.array_distinct(cs)).cast("long").alias("n_distinct_chars"),
        h6.alias("entropy_bits"),
        gate.alias("entropy_gate"),
    )


def char_entropy_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`char_entropy`: same per-doc char histogram via
    list lambdas, same ``(ln n - sum(c ln c)/n)/ln 2`` identity, same
    half-away 6dp rounding and gate cuts."""
    return f"""
    WITH d AS (
      SELECT doc_id, string_split({text_col}, '') AS cs,
             length({text_col})::BIGINT AS n_chars
      FROM {table} WHERE length({text_col}) > 0),
    e AS (
      SELECT doc_id, n_chars,
             len(list_distinct(cs))::BIGINT AS n_distinct_chars,
             list_sum(list_transform(
               list_transform(list_distinct(cs),
                              c -> len(list_filter(cs, y -> y = c))),
               c -> c::DOUBLE * ln(c::DOUBLE))) AS s
      FROM d),
    h AS (
      SELECT doc_id, n_chars, n_distinct_chars,
             FLOOR((ln(n_chars::DOUBLE) - s / n_chars::DOUBLE) / ln(2.0)
                   * 1e6 + 0.5) / 1e6 AS entropy_bits
      FROM e)
    SELECT doc_id, n_chars, n_distinct_chars, entropy_bits,
           CASE WHEN entropy_bits < {ENTROPY_LOW_BITS} THEN 'low_entropy'
                WHEN entropy_bits > {ENTROPY_HIGH_BITS} THEN 'high_entropy'
                ELSE 'ok' END AS entropy_gate
    FROM h
    """


# Flesch band cuts (standard reading-ease bands).
FLESCH_BANDS = ((90.0, "very_easy"), (60.0, "standard"), (30.0, "difficult"))


def readability(docs_in: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease quality gate: per-doc word / sentence / syllable
    counts (syllables approximated as ``[aeiouy]+`` vowel groups — the
    classic deterministic proxy) and the Flesch score
    ``206.835 - 1.015*(words/sents) - 84.6*(syll/words)`` banded into
    reading-difficulty classes.

    All counts are exact integers from codegen regex built-ins; the score
    is one float formula over them, snapped to the shared half-away 1e-3
    grid so the DuckDB twin is bit-identical.  One scan, no shuffle at all
    (per-row projection), filter-gate composable with the other ds_*
    quality signals."""
    docs = fan_out(docs_in)
    n_words = F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"))
    n_sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syll = F.greatest(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")),
        F.lit(1),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    s3 = F.floor(score * F.lit(1e3) + F.lit(0.5)) / F.lit(1e3)
    band = F.when(s3 >= FLESCH_BANDS[0][0], F.lit(FLESCH_BANDS[0][1]))
    for cut, name in FLESCH_BANDS[1:]:
        band = band.when(s3 >= cut, F.lit(name))
    band = band.otherwise(F.lit("very_difficult"))
    return docs.where(F.length(text_col) > 0).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syllables"),
        s3.alias("flesch"),
        band.alias("band"),
    )


def readability_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`readability` — identical regex counts (shared
    Java/RE2 syntax), identical formula, identical rounding and bands."""
    cases = "\n                ".join(
        f"WHEN flesch >= {cut} THEN '{name}'" for cut, name in FLESCH_BANDS
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim({text_col}),
                                       '[ \\t\\n\\r\\f]+'))::BIGINT AS n_words,
             GREATEST(len(regexp_extract_all({text_col}, '[.!?]+')),
                      1)::BIGINT AS n_sents,
             GREATEST(len(regexp_extract_all(lower({text_col}),
                                             '[aeiouy]+')),
                      1)::BIGINT AS n_syllables
      FROM {table} WHERE length({text_col}) > 0),
    s AS (
      SELECT doc_id, n_words, n_sents, n_syllables,
             FLOOR((206.835
                    - 1.015 * (n_words::DOUBLE / n_sents::DOUBLE)
                    - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE))
                   * 1e3 + 0.5) / 1e3 AS flesch
      FROM c)
    SELECT doc_id, n_words, n_sents, n_syllables, flesch,
           CASE {cases}
                ELSE 'very_difficult' END AS band
    FROM s
    """


NOVELTY_N = 3
NOVELTY_BUCKETS = 8


def ngram_novelty(docs_in: DataFrame, n_buckets: int = NOVELTY_BUCKETS,
                  n: int = NOVELTY_N, text_col: str = "text") -> DataFrame:
    """Corpus novelty curve: per ingest bucket, how much of its word
    n-gram vocabulary is NEW — never seen in any earlier bucket.  The
    curve every growing pre-training corpus gets asked for ("is the next
    crawl still adding content, or re-crawling what we have?"); a bucket
    whose novelty collapses is the diminishing-returns signal.

    Ingest buckets are the equal-width doc-id slices of trend.py
    (integer DIV on both engines).  The first-seen bucket per gram is a
    combinable MIN — map-side partials, never a window over the gram key,
    so a boilerplate gram in 10^9 documents crosses the exchange once per
    map partition (the segment_dedup discipline).  Two aggregates over
    the distinct (bucket, gram) frame, both map-side combined; novelty is
    integer basis points.

    Output: (bucket, n_distinct, n_new, novelty_bp) — bucket 0 is 10000
    by construction.
    Reference analog: none (curation-monitoring family).
    """
    from ..cache import tracked_persist
    from .parallelism import fan_out

    docs = fan_out(docs_in)
    mx = docs.agg(F.max("doc_id").alias("max_id"))
    words = docs.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.expr(f"(doc_id * {n_buckets}) DIV (max_id + 1)"),
            F.lit(n_buckets - 1).cast("long"),
        ).alias("bucket"),
        F.split(
            F.regexp_replace(
                F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f]+", " "
            ),
            " ",
        ).alias("w"),
    )
    grams = (
        words.select(
            "bucket",
            F.explode(
                F.when(
                    F.size("w") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - (n - 1)),
                        lambda i: F.array_join(F.slice("w", i, n), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .distinct()
    )
    # two consumers: the first-seen MIN and the per-bucket distinct count
    grams = tracked_persist(grams)
    per_bucket = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    news = (
        grams.groupBy("gram")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    return (
        per_bucket.join(news, "bucket", "left")
        .select(
            "bucket",
            "n_distinct",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.expr("(10000 * COALESCE(n_new, 0)) DIV n_distinct")
            .alias("novelty_bp"),
        )
    )


def ngram_novelty_sql(table: str = "documents",
                      n_buckets: int = NOVELTY_BUCKETS,
                      n: int = NOVELTY_N, text_col: str = "text") -> str:
    """DuckDB twin of :func:`ngram_novelty` (same normalizer, same integer
    DIV bucketing, same first-seen MIN)."""
    return f"""
    WITH mx AS (SELECT MAX(doc_id) AS max_id FROM {table}),
    w AS (
      SELECT LEAST((doc_id * {n_buckets}) // (max_id + 1),
                   {n_buckets - 1}) AS bucket,
             string_split(regexp_replace(lower(trim({text_col})),
                                         '[ \t\n\r\f]+', ' ', 'g'), ' ') AS w
      FROM {table}, mx),
    g AS (
      SELECT DISTINCT bucket, array_to_string(w[i:i+{n - 1}], ' ') AS gram
      FROM w, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}),
    per_bucket AS (
      SELECT bucket, COUNT(*)::BIGINT AS n_distinct FROM g GROUP BY bucket),
    firsts AS (SELECT gram, MIN(bucket) AS bucket FROM g GROUP BY gram),
    news AS (SELECT bucket, COUNT(*)::BIGINT AS n_new FROM firsts GROUP BY bucket)
    SELECT p.bucket, p.n_distinct,
           COALESCE(n.n_new, 0)::BIGINT AS n_new,
           (10000 * COALESCE(n.n_new, 0)) // p.n_distinct AS novelty_bp
    FROM per_bucket p LEFT JOIN news n USING (bucket)
    """
