"""Probabilistic-sketch operators over the document token stream: count-min
heavy-hitter estimation, a deterministic HyperLogLog distinct-count sketch,
and a Bloom-filter membership pre-filter.

Why sketches are first-class at 100 TB: every one of these replaces an
unbounded-state exact aggregation with a FIXED-size, map-side-combinable
summary — a count-min sketch is 4x1024 longs, an HLL is 256 registers per
group, a Bloom filter is 1024 words — so the shuffle that builds them
carries kilobytes per partition no matter how many tokens flow in, and the
merged sketch broadcasts for free to whatever stage consumes it (the exact
top-k / distinct / membership joins they approximate all shuffle the full
key space).

Determinism discipline (what makes the DuckDB twins exact):

* every hash is the shared md5-60bit trick (first 15 hex chars ->
  non-negative BIGINT, identical in any engine — operators/negsample.py);
* register ranks use bit_length via ``length(bin(x))`` (both engines print
  minimal binary strings, bin(0) = '0');
* all sketch state is integer (counts, max-ranks, OR-ed bit words); the
  ONLY float ops are a final division snapped to the shared
  floor(x*1e6+0.5)/1e6 grid, and ``pow(2, k)`` for integer k in [0, 40],
  which is exact in IEEE doubles;
* Bloom words pack 62 bits per BIGINT so no shift ever touches the sign
  bit (DuckDB raises on ``1::BIGINT << 63``).

Reference contact: none (the reference is a per-document NER engine);
these extend the training-data-pipeline family of operators/textops.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# count-min
CM_DEPTH = 4
CM_WIDTH = 1024
CM_TOPK = 50

# HyperLogLog
HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_RHO_CAP = 40               # rank cap so 2^(CAP - rho) sums stay in BIGINT
# alpha_m * m^2 for m = 256 (Flajolet et al. 2007), embedded as one shared
# decimal literal so both engines parse the identical double
HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
HLL_K_LIT = repr(HLL_ALPHA_M2 * float(1 << HLL_RHO_CAP))

# Bloom
BLOOM_K = 3
BLOOM_WORDS = 1024
BLOOM_BITS_PER_WORD = 62
BLOOM_M = BLOOM_WORDS * BLOOM_BITS_PER_WORD

_TOKEN_RE = "[a-z]+"


def _md5_60(col):
    """First 15 hex chars of md5 -> non-negative BIGINT (shared trick)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, term) token stream — same [a-z]+ tokenizer as
    tfidf_topk / inverted_index so the sketch families agree on terms."""
    return docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
        ).alias("term"),
    )


_TOKENS_SQL = f"""
      SELECT doc_id, lang,
             unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS term
      FROM documents"""


# ---------------------------------------------------------------------------
# count-min heavy hitters
# ---------------------------------------------------------------------------

def _cm_buckets(term_col):
    """Array of CM_DEPTH bucket ids for one term (md5-salted per row)."""
    return F.array(*[
        _md5_60(F.concat(F.lit(f"{r}:"), term_col)) % CM_WIDTH
        for r in range(CM_DEPTH)
    ])


def count_min_topk(docs_in: DataFrame, k: int = CM_TOPK) -> DataFrame:
    """Count-min heavy hitters: build a CM_DEPTH x CM_WIDTH sketch over the
    token stream, then report the exact top-``k`` terms alongside their
    sketch estimate (always >= exact; the overestimate column is the
    collision mass).

    Scale shape: ONE (term) count shuffle (map-side combined) feeds both
    the sketch build and the winner selection; the sketch itself is
    groupBy(row, bucket) over at most DEPTH*WIDTH = 4096 cells, broadcast
    to the winner probe.  Winner selection is orderBy+limit
    (TakeOrderedAndProject per-partition heaps), never a global window.
    """
    from ..cache import tracked_persist
    from .textops import fan_out

    tf = tracked_persist(
        _tokens(fan_out(docs_in))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    cells = tf.select(
        "exact_cnt",
        F.posexplode(_cm_buckets(F.col("term"))).alias("r", "bucket"),
    )
    sketch = cells.groupBy("r", "bucket").agg(
        F.sum("exact_cnt").alias("cell_cnt")
    )
    winners = tf.orderBy(F.desc("exact_cnt"), F.asc("term")).limit(k)
    probe = winners.select(
        "term", "exact_cnt",
        F.posexplode(_cm_buckets(F.col("term"))).alias("r", "bucket"),
    )
    est = (
        probe.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cm_est"))
    )
    w = Window.orderBy(F.desc("exact_cnt"), F.asc("term"))
    return est.select(
        "term", "exact_cnt", "cm_est",
        (F.col("cm_est") - F.col("exact_cnt")).alias("overestimate"),
    ).withColumn("rnk", F.row_number().over(w).cast("long"))


def _cm_bucket_sql(r: int, term: str = "term") -> str:
    return (f"(('0x' || substr(md5('{r}:' || {term}), 1, 15))::BIGINT"
            f" % {CM_WIDTH})")


def count_min_topk_sql(k: int = CM_TOPK) -> str:
    """DuckDB twin: same salted md5 buckets, same min-over-rows estimate."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cm_bucket_sql(r)} AS bucket, exact_cnt FROM tf"
        for r in range(CM_DEPTH)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT term, exact_cnt, {r} AS r, {_cm_bucket_sql(r)} AS bucket "
        f"FROM winners"
        for r in range(CM_DEPTH)
    )
    return f"""
    WITH toks AS ({_TOKENS_SQL}),
    tf AS MATERIALIZED (
      SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term),
    cells AS ({cell_rows}),
    sketch AS MATERIALIZED (
      SELECT r, bucket, SUM(exact_cnt) AS cell_cnt
      FROM cells GROUP BY r, bucket),
    winners AS MATERIALIZED (
      SELECT term, exact_cnt FROM tf
      ORDER BY exact_cnt DESC, term ASC LIMIT {k}),
    probe AS ({probe_rows}),
    est AS (
      SELECT p.term, p.exact_cnt, MIN(s.cell_cnt) AS cm_est
      FROM probe p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
      GROUP BY p.term, p.exact_cnt)
    SELECT term, exact_cnt, cm_est::BIGINT AS cm_est,
           (cm_est - exact_cnt)::BIGINT AS overestimate,
           ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, term ASC) AS rnk
    FROM est
    """


# ---------------------------------------------------------------------------
# deterministic HyperLogLog
# ---------------------------------------------------------------------------

def hll_distinct(docs_in: DataFrame) -> DataFrame:
    """Per-language HyperLogLog estimate of distinct (doc, term) pairs next
    to the exact count: (lang, exact_distinct, hll_regs_nonzero, hll_sum,
    hll_est).

    The sketched key is the (doc_id, term) pair, not the bare term: the
    synthetic corpus vocabulary is tiny (~31 terms/lang at every SF), which
    would park a bare-term sketch in the small-range regime where raw HLL
    needs the linear-counting branch — and linear counting needs ln(),
    whose bit-parity across libm implementations is exactly what this twin
    discipline avoids.  Pair cardinality is ≥ 2.5*m at every SF, where the
    raw estimator is the published one.

    The sketch state is integer end to end — register = low 8 bits of the
    md5-60 hash, rank rho = leading zeros of the remaining 52 bits + 1
    (via length(bin(x)), capped at HLL_RHO_CAP), per-(lang, register) MAX
    combines map-side — and the harmonic sum is folded into the exact
    BIGINT ``hll_sum = sum(2^(CAP - rho)) + empty_regs * 2^CAP`` so the
    only float op is the final one-division estimate
    ``alpha*m^2*2^CAP / hll_sum`` (no log/linear-counting branch: libm
    bit-parity across engines is not guaranteed, so the raw HLL estimator
    is reported and the exact count sits beside it).

    Scale: the shuffle carries at most 256 registers per language,
    whatever the token volume.
    """
    from .textops import fan_out

    toks = _tokens(fan_out(docs_in))
    hashed = toks.select(
        "lang",
        _md5_60(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("term"))
        ).alias("h"),
    )
    # integer DIV, not float division: h is up to 2^60 and doubles lose
    # exactness above 2^53
    rest = F.expr(f"h DIV {HLL_M}")  # top 52 bits (h is >= 0)
    rho = F.least(
        F.when(rest == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(rest))),
        F.lit(HLL_RHO_CAP),
    )
    regs = (
        hashed.select("lang", (F.col("h") % HLL_M).alias("reg"),
                      rho.alias("rho"))
        .groupBy("lang", "reg")
        .agg(F.max("rho").alias("m_rho"))
    )
    per_lang = regs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("hll_regs_nonzero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("m_rho"))
            .cast("long")
        ).alias("s_present"),
    )
    exact = (
        toks.groupBy("lang")
        .agg(F.countDistinct("doc_id", "term").alias("exact_distinct"))
    )
    hll_sum = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("hll_regs_nonzero"))
        * F.lit(1 << HLL_RHO_CAP)
    )
    est = F.lit(float(HLL_K_LIT)) / hll_sum.cast("double")
    return (
        exact.join(per_lang, "lang")
        .select(
            "lang", "exact_distinct", "hll_regs_nonzero",
            hll_sum.alias("hll_sum"),
            (F.floor(est * F.lit(1000000.0) + F.lit(0.5))
             / F.lit(1000000.0)).alias("hll_est"),
        )
    )


def hll_distinct_sql() -> str:
    """DuckDB twin: identical register/rank arithmetic and final division."""
    cap = HLL_RHO_CAP
    return f"""
    WITH toks AS ({_TOKENS_SQL}),
    hashed AS (
      SELECT lang,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || term), 1, 15)
             )::BIGINT AS h
      FROM toks),
    ranked AS (
      SELECT lang,
             h % {HLL_M} AS reg,
             LEAST(CASE WHEN h // {HLL_M} = 0 THEN 53
                        ELSE 53 - length(bin(h // {HLL_M})) END,
                   {cap}) AS rho
      FROM hashed),
    regs AS (
      SELECT lang, reg, MAX(rho) AS m_rho FROM ranked GROUP BY lang, reg),
    per_lang AS (
      SELECT lang,
             COUNT(*) AS hll_regs_nonzero,
             SUM(CAST(pow(2, {cap} - m_rho) AS BIGINT)) AS s_present
      FROM regs GROUP BY lang),
    exact AS (
      SELECT lang, COUNT(DISTINCT (doc_id, term)) AS exact_distinct
      FROM toks GROUP BY lang)
    SELECT e.lang, e.exact_distinct, p.hll_regs_nonzero,
           (p.s_present
            + ({HLL_M} - p.hll_regs_nonzero) * {1 << cap}::BIGINT)::BIGINT
             AS hll_sum,
           FLOOR({HLL_K_LIT}
                 / CAST(p.s_present
                        + ({HLL_M} - p.hll_regs_nonzero)
                          * {1 << cap}::BIGINT AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS hll_est
    FROM exact e JOIN per_lang p ON e.lang = p.lang
    """


# ---------------------------------------------------------------------------
# Bloom-filter membership
# ---------------------------------------------------------------------------

def _bloom_positions(terms: DataFrame) -> DataFrame:
    """(term) -> (term, word, mask): BLOOM_K salted md5 bit positions,
    packed 62 bits per BIGINT word so no shift touches the sign bit."""
    pos = F.posexplode(
        F.array(*[
            _md5_60(F.concat(F.lit(f"{i}:"), F.col("term"))) % BLOOM_M
            for i in range(BLOOM_K)
        ])
    )
    return (
        terms.select("term", pos.alias("i", "_pos"))
        .select(
            "term",
            F.expr(f"_pos DIV {BLOOM_BITS_PER_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(_pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
    )


def bloom_membership(docs_in: DataFrame, build_lang: str = "en") -> DataFrame:
    """Build a Bloom filter over the distinct terms of ``build_lang``
    documents, probe it with every other language's distinct terms, and
    report the confusion summary in ONE row:
    (n_probed, n_bloom_positive, n_present, n_false_positive,
    n_false_negative, fp_rate).

    n_false_negative is structurally 0 (Bloom filters have no false
    negatives) — emitting it makes the invariant a driver-checked fact.

    Scale shape: the filter is BLOOM_WORDS = 1024 OR-aggregated BIGINT
    words (bit_or combines map-side), broadcast to the probe side — the
    pre-filter pattern that replaces a full shuffle join against a huge
    build side.  The exact-membership join used here to GRADE the filter
    is the thing the Bloom filter replaces in production.
    """
    from ..cache import tracked_persist
    from .textops import fan_out

    toks = _tokens(fan_out(docs_in))
    build_terms = (
        toks.where(F.col("lang") == build_lang).select("term").distinct()
    )
    probe_terms = tracked_persist(
        toks.where(F.col("lang") != build_lang).select("term").distinct()
    )
    bloom = (
        _bloom_positions(build_terms)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    hits = (
        _bloom_positions(probe_terms)
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "term",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("hit"),
        )
        .groupBy("term")
        .agg((F.sum("hit") == BLOOM_K).cast("int").alias("in_bloom"))
    )
    truth = probe_terms.join(
        build_terms.select("term", F.lit(1).alias("present")), "term", "left"
    ).select("term", F.coalesce(F.col("present"), F.lit(0)).alias("present"))
    graded = hits.join(truth, "term")
    fp_rate = (
        F.sum(
            ((F.col("in_bloom") == 1) & (F.col("present") == 0)).cast("long")
        ).cast("double")
        / F.count(F.lit(1)).cast("double")
    )
    return graded.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("in_bloom").cast("long").alias("n_bloom_positive"),
        F.sum("present").cast("long").alias("n_present"),
        F.sum(
            ((F.col("in_bloom") == 1) & (F.col("present") == 0)).cast("long")
        ).alias("n_false_positive"),
        F.sum(
            ((F.col("in_bloom") == 0) & (F.col("present") == 1)).cast("long")
        ).alias("n_false_negative"),
        (F.floor(fp_rate * F.lit(1000000.0) + F.lit(0.5))
         / F.lit(1000000.0)).alias("fp_rate"),
    )


def bloom_membership_sql(build_lang: str = "en") -> str:
    """DuckDB twin: same salted positions, 62-bit words, bit_or build."""
    def pos_rows(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT term,"
            f" (('0x' || substr(md5('{i}:' || term), 1, 15))::BIGINT"
            f" % {BLOOM_M}) AS pos FROM {src}"
            for i in range(BLOOM_K)
        )

    w = BLOOM_BITS_PER_WORD
    return f"""
    WITH toks AS ({_TOKENS_SQL}),
    build_terms AS MATERIALIZED (
      SELECT DISTINCT term FROM toks WHERE lang = '{build_lang}'),
    probe_terms AS MATERIALIZED (
      SELECT DISTINCT term FROM toks WHERE lang <> '{build_lang}'),
    bpos AS ({pos_rows("build_terms")}),
    bloom AS MATERIALIZED (
      SELECT pos // {w} AS word,
             bit_or(1::BIGINT << CAST(pos % {w} AS INT)) AS bits
      FROM bpos GROUP BY pos // {w}),
    ppos AS ({pos_rows("probe_terms")}),
    hits AS (
      SELECT p.term,
             CASE WHEN SUM(CASE WHEN b.bits IS NOT NULL
                                 AND (b.bits & (1::BIGINT
                                      << CAST(p.pos % {w} AS INT)))
                                     = (1::BIGINT
                                        << CAST(p.pos % {w} AS INT))
                                THEN 1 ELSE 0 END) = {BLOOM_K}
                  THEN 1 ELSE 0 END AS in_bloom
      FROM ppos p LEFT JOIN bloom b ON p.pos // {w} = b.word
      GROUP BY p.term),
    truth AS (
      SELECT p.term,
             CASE WHEN b.term IS NULL THEN 0 ELSE 1 END AS present
      FROM probe_terms p LEFT JOIN build_terms b ON p.term = b.term),
    graded AS (
      SELECT h.in_bloom, t.present
      FROM hits h JOIN truth t ON h.term = t.term)
    SELECT COUNT(*) AS n_probed,
           SUM(in_bloom)::BIGINT AS n_bloom_positive,
           SUM(present)::BIGINT AS n_present,
           SUM(CASE WHEN in_bloom = 1 AND present = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_false_positive,
           SUM(CASE WHEN in_bloom = 0 AND present = 1
                    THEN 1 ELSE 0 END)::BIGINT AS n_false_negative,
           FLOOR(SUM(CASE WHEN in_bloom = 1 AND present = 0
                          THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE * 1000000.0 + 0.5)
             / 1000000.0 AS fp_rate
    FROM graded
    """


# ---------------------------------------------------------------------------
# Bloom-prefiltered join (shuffle-reduction audit)
# ---------------------------------------------------------------------------

BLOOM_JOIN_PRICE_CUT = 400000.0   # build side: expensive orders only


def bloom_prefilter_join(orders: DataFrame, lineitem: DataFrame,
                         price_cut: float = BLOOM_JOIN_PRICE_CUT) -> DataFrame:
    """Bloom-prefiltered join — the shuffle-reduction pattern for a
    selective build side: a Bloom filter over the qualifying orderkeys
    (expensive orders) broadcasts to the lineitem side, which drops
    definitely-unmatched rows BEFORE the shuffle join; the exact join
    then runs over survivors only.  The audit reports what the filter
    bought and what its false positives cost:

    - ``n_pass_keys`` vs ``n_probe_keys``: probe-key space surviving the
      filter (the shuffled fraction);
    - ``n_fp_keys``: keys that passed but match nothing — pure wasted
      shuffle (Bloom has no false negatives, so ``n_joined`` is exact);
    - ``rows_shuffled`` vs ``n_lineitem``: the row-level reduction.

    Scale shape: the filter is 1024 OR-aggregated BIGINTs (bit_or
    combines map-side) BROADCAST to the probe side; probe membership is
    graded on the DISTINCT key frame (bounded by key cardinality, not
    row count) and rejoined to lineitem as a broadcast-able semi-join.
    Output one row: (n_build_keys, n_probe_keys, n_pass_keys, n_fp_keys,
    n_lineitem, rows_shuffled, n_joined)."""
    from ..cache import tracked_persist

    build_keys = tracked_persist(
        orders.where(F.col("o_totalprice") > price_cut)
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    bterms = build_keys.select(F.col("k").cast("string").alias("term"))
    bloom = (
        _bloom_positions(bterms)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probe_keys = tracked_persist(
        lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    )
    pterms = probe_keys.select("k", F.col("k").cast("string").alias("term"))
    graded = (
        _bloom_positions(pterms.select("term").distinct())
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "term",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("hit"),
        )
        .groupBy("term")
        .agg((F.sum("hit") == BLOOM_K).cast("long").alias("in_bloom"))
    )
    pass_keys = tracked_persist(
        pterms.join(graded, "term").where(F.col("in_bloom") == 1).select("k")
    )
    li_k = lineitem.select(F.col("l_orderkey").alias("k"))
    survivors = li_k.join(F.broadcast(pass_keys), "k", "left_semi")
    joined = li_k.join(build_keys, "k", "left_semi")
    counts = [
        build_keys.agg(F.count(F.lit(1)).alias("n_build_keys")),
        probe_keys.agg(F.count(F.lit(1)).alias("n_probe_keys")),
        pass_keys.agg(F.count(F.lit(1)).alias("n_pass_keys")),
        pass_keys.join(build_keys, "k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_fp_keys")
        ),
        li_k.agg(F.count(F.lit(1)).alias("n_lineitem")),
        survivors.agg(F.count(F.lit(1)).alias("rows_shuffled")),
        joined.agg(F.count(F.lit(1)).alias("n_joined")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


def bloom_prefilter_join_sql(price_cut: float = BLOOM_JOIN_PRICE_CUT) -> str:
    """DuckDB twin: same salted positions, 62-bit words, membership rule
    and count battery."""
    w = BLOOM_BITS_PER_WORD

    def pos_rows(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT term,"
            f" (('0x' || substr(md5('{i}:' || term), 1, 15))::BIGINT"
            f" % {BLOOM_M}) AS pos FROM {src}"
            for i in range(BLOOM_K)
        )

    return f"""
    WITH build_keys AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_totalprice > {price_cut}),
    bterms AS (SELECT k::VARCHAR AS term FROM build_keys),
    bpos AS ({pos_rows("bterms")}),
    bloom AS MATERIALIZED (
      SELECT pos // {w} AS word,
             bit_or(1::BIGINT << CAST(pos % {w} AS INT)) AS bits
      FROM bpos GROUP BY pos // {w}),
    probe_keys AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS k FROM lineitem),
    pterms AS (SELECT DISTINCT k::VARCHAR AS term FROM probe_keys),
    ppos AS ({pos_rows("pterms")}),
    graded AS MATERIALIZED (
      SELECT p.term,
             CASE WHEN SUM(CASE WHEN b.bits IS NOT NULL
                                 AND (b.bits & (1::BIGINT
                                      << CAST(p.pos % {w} AS INT)))
                                     = (1::BIGINT
                                        << CAST(p.pos % {w} AS INT))
                                THEN 1 ELSE 0 END) = {BLOOM_K}
                  THEN 1 ELSE 0 END AS in_bloom
      FROM ppos p LEFT JOIN bloom b ON p.pos // {w} = b.word
      GROUP BY p.term),
    pass_keys AS MATERIALIZED (
      SELECT pk.k FROM probe_keys pk
      JOIN graded g ON g.term = pk.k::VARCHAR
      WHERE g.in_bloom = 1)
    SELECT
      (SELECT COUNT(*) FROM build_keys)::BIGINT AS n_build_keys,
      (SELECT COUNT(*) FROM probe_keys)::BIGINT AS n_probe_keys,
      (SELECT COUNT(*) FROM pass_keys)::BIGINT AS n_pass_keys,
      (SELECT COUNT(*) FROM pass_keys p
        WHERE NOT EXISTS (SELECT 1 FROM build_keys b WHERE b.k = p.k)
      )::BIGINT AS n_fp_keys,
      (SELECT COUNT(*) FROM lineitem)::BIGINT AS n_lineitem,
      (SELECT COUNT(*) FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM pass_keys p WHERE p.k = l.l_orderkey)
      )::BIGINT AS rows_shuffled,
      (SELECT COUNT(*) FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM build_keys b WHERE b.k = l.l_orderkey)
      )::BIGINT AS n_joined
    """


# ---------------------------------------------------------------------------
# HLL rollup: per-language sketches merged into a corpus sketch
# ---------------------------------------------------------------------------

def hll_rollup(docs_in: DataFrame) -> DataFrame:
    """Hierarchical distinct-count rollup built by MERGING the per-language
    HLL sketches of :func:`hll_distinct` — the property that makes sketches
    the scale answer for hierarchy dashboards: a 100-TB corpus keeps ONE
    256-register sketch per leaf (language / shard / day), and every
    rollup level is a register-wise MAX over child sketches — no second
    scan of the data, no re-hash, and the merged estimate is IDENTICAL to
    the estimate a direct build over the union would produce (max is
    associative/commutative/idempotent; pytest asserts register equality).

    Emits one row per language plus a ``__all__`` row whose registers come
    from merging the per-language registers, with the exact distinct count
    beside each estimate.  Columns: (scope, exact_distinct,
    hll_regs_nonzero, hll_sum, hll_est).
    """
    from .textops import fan_out

    toks = _tokens(fan_out(docs_in))
    hashed = toks.select(
        "lang",
        _md5_60(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("term"))
        ).alias("h"),
    )
    rest = F.expr(f"h DIV {HLL_M}")
    rho = F.least(
        F.when(rest == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(rest))),
        F.lit(HLL_RHO_CAP),
    )
    leaf_regs = (
        hashed.select("lang", (F.col("h") % HLL_M).alias("reg"),
                      rho.alias("rho"))
        .groupBy("lang", "reg")
        .agg(F.max("rho").alias("m_rho"))
    )
    # the rollup step: register-wise max over the CHILD SKETCHES — the
    # raw token stream is never touched again
    merged_regs = (
        leaf_regs.groupBy("reg")
        .agg(F.max("m_rho").alias("m_rho"))
        .select(F.lit("__all__").alias("scope"), "reg", "m_rho")
    )
    all_regs = (
        leaf_regs.select(F.col("lang").alias("scope"), "reg", "m_rho")
        .unionByName(merged_regs)
    )
    per_scope = all_regs.groupBy("scope").agg(
        F.count(F.lit(1)).alias("hll_regs_nonzero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("m_rho"))
            .cast("long")
        ).alias("s_present"),
    )
    exact = (
        toks.groupBy("lang")
        .agg(F.countDistinct("doc_id", "term").alias("exact_distinct"))
        .select(F.col("lang").alias("scope"), "exact_distinct")
        .unionByName(
            toks.agg(
                F.countDistinct("doc_id", "term").alias("exact_distinct")
            ).select(F.lit("__all__").alias("scope"), "exact_distinct")
        )
    )
    hll_sum = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("hll_regs_nonzero"))
        * F.lit(1 << HLL_RHO_CAP)
    )
    est = F.lit(float(HLL_K_LIT)) / hll_sum.cast("double")
    return (
        exact.join(per_scope, "scope")
        .select(
            "scope", "exact_distinct", "hll_regs_nonzero",
            hll_sum.alias("hll_sum"),
            (F.floor(est * F.lit(1000000.0) + F.lit(0.5))
             / F.lit(1000000.0)).alias("hll_est"),
        )
    )


def hll_rollup_sql() -> str:
    """DuckDB twin of :func:`hll_rollup` — identical leaf registers,
    identical register-wise-max merge, identical estimate arithmetic."""
    cap = HLL_RHO_CAP
    return f"""
    WITH toks AS ({_TOKENS_SQL}),
    hashed AS (
      SELECT lang,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || term), 1, 15)
             )::BIGINT AS h
      FROM toks),
    ranked AS (
      SELECT lang,
             h % {HLL_M} AS reg,
             LEAST(CASE WHEN h // {HLL_M} = 0 THEN 53
                        ELSE 53 - length(bin(h // {HLL_M})) END,
                   {cap}) AS rho
      FROM hashed),
    leaf_regs AS (
      SELECT lang, reg, MAX(rho) AS m_rho FROM ranked GROUP BY lang, reg),
    all_regs AS (
      SELECT lang AS scope, reg, m_rho FROM leaf_regs
      UNION ALL
      SELECT '__all__' AS scope, reg, MAX(m_rho) AS m_rho
      FROM leaf_regs GROUP BY reg),
    per_scope AS (
      SELECT scope,
             COUNT(*) AS hll_regs_nonzero,
             SUM(CAST(pow(2, {cap} - m_rho) AS BIGINT)) AS s_present
      FROM all_regs GROUP BY scope),
    exact AS (
      SELECT lang AS scope, COUNT(DISTINCT (doc_id, term)) AS exact_distinct
      FROM toks GROUP BY lang
      UNION ALL
      SELECT '__all__' AS scope, COUNT(DISTINCT (doc_id, term))
      FROM toks)
    SELECT e.scope, e.exact_distinct, p.hll_regs_nonzero,
           (p.s_present
            + ({HLL_M} - p.hll_regs_nonzero) * {1 << cap}::BIGINT)::BIGINT
             AS hll_sum,
           FLOOR({HLL_K_LIT}
                 / CAST(p.s_present
                        + ({HLL_M} - p.hll_regs_nonzero)
                          * {1 << cap}::BIGINT AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS hll_est
    FROM exact e JOIN per_scope p ON e.scope = p.scope
    """
