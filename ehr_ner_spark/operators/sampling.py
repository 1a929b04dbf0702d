"""Deterministic sampling + sequence packing for training-data pipelines.

* :func:`stratified_sample` — per-stratum hash-threshold sampling.  A doc is
  kept iff ``md5_60('sample:' || doc_id) % 1e6 < rate_ppm(stratum)``: no RNG
  state, so the sample is reproducible across runs, resumes, cluster sizes
  and engines (the DuckDB twin evaluates the identical expression).  Pure
  map-side projection — no keyed shuffle ever (nothing groups or joins);
  the only possible exchange is :func:`fan_out`'s round-robin widening when
  the input arrives with fewer partitions than the cluster has cores, which
  a well-partitioned warehouse-scale input never triggers.

* :func:`pack_sequences` — the GPT-style packed-pretraining layout:
  documents are concatenated in doc_id order and chunked every ``chunk``
  tokens; each document's global token offset is a prefix sum of token
  counts.  Spark-first prefix sum: instead of a global ORDER BY window (a
  single-partition bottleneck at 100 TB), doc_ids are range-bucketed, the
  per-bucket totals (a tiny frame: one row per bucket) take the only global
  window, and the per-doc cumulative sum runs bucket-locally — two small
  shuffles, both on bounded keys.  The DuckDB twin is the plain
  ``SUM() OVER (ORDER BY doc_id)`` the distributed plan must equal.

Reference analog: none (the reference trains on a fixed dataset) — these
are engine-supplied pipeline components like the dedup/ANN family.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..hashing import md5_60_expr
from .parallelism import fan_out

SAMPLE_MOD = 1_000_000


def sample_key(id_col, salt: str = "sample"):
    """The shared engine/oracle sampling key: md5_60('<salt>:' || id) % 1e6."""
    return F.pmod(
        md5_60_expr(F.concat(F.lit(salt + ":"), id_col.cast("string"))),
        F.lit(SAMPLE_MOD),
    )


def stratified_sample(
    docs_in: DataFrame,
    rates_ppm: Dict[str, int],
    default_ppm: int = 0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff its deterministic sample key falls under its
    stratum's rate (parts-per-million).  Output: (doc_id, stratum,
    sample_key) for the kept rows."""
    key = sample_key(F.col(id_col), salt)
    rate = F.lit(default_ppm)
    for stratum in sorted(rates_ppm):  # deterministic build order
        rate = F.when(F.col(stratum_col) == stratum, F.lit(rates_ppm[stratum])).otherwise(rate)
    return (
        fan_out(docs_in)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            key.alias("sample_key"),
            rate.alias("_rate"),
        )
        .where(F.col("sample_key") < F.col("_rate"))
        .drop("_rate")
    )


def stratified_sample_sql(
    rates_ppm: Dict[str, int],
    default_ppm: int = 0,
    table: str = "documents",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (identical expressions)."""
    whens = " ".join(
        f"WHEN '{s}' THEN {rates_ppm[s]}" for s in sorted(rates_ppm)
    )
    key = (
        f"('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {SAMPLE_MOD}"
    )
    return f"""
    SELECT {id_col} AS doc_id, {stratum_col} AS stratum, {key} AS sample_key
    FROM {table}
    WHERE {key} < CASE {stratum_col} {whens} ELSE {default_ppm} END
    """


from .textops import BPE_RE  # noqa: E402  (shared token definition)


def pack_sequences(
    docs_in: DataFrame,
    chunk: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1024,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Concat-then-chunk packing layout.  Output per document:
    (doc_id, n_tokens, start_tok, seq_first, seq_last) where start_tok is
    the document's offset in the concatenated token stream (doc_id order)
    and seq_first/seq_last are the first/last ``chunk``-token training
    sequences the document lands in.  Empty documents contribute zero
    tokens but still report the single sequence position at their offset
    (seq_last == seq_first, via ``greatest(n_tokens, 1)``) — consumers
    drop them by ``n_tokens = 0``, not by a seq range test; the DuckDB
    twin uses the identical GREATEST convention.

    Distributed prefix sum: bucket = doc_id // bucket_width; the global
    window runs only over the per-bucket totals (n_docs / bucket_width
    rows), broadcast-joined back; the per-doc cumsum is bucket-local."""
    toks = fan_out(docs_in).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_tokens"),
        (F.col(id_col) / bucket_width).cast("long").alias("_bkt"),
    )
    bucket_totals = toks.groupBy("_bkt").agg(F.sum("n_tokens").alias("_btot"))
    # ONE global window, over the tiny bucket frame only
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "_bkt", F.coalesce(F.sum("_btot").over(wb), F.lit(0)).alias("_boff")
    )
    wd = (
        Window.partitionBy("_bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.join(F.broadcast(offsets), "_bkt")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("_boff") + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0))
            ).alias("start_tok"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_tok",
            (F.col("start_tok") / chunk).cast("long").alias("seq_first"),
            (
                (F.col("start_tok") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / chunk
            ).cast("long").alias("seq_last"),
        )
    )
    return packed


def pack_sequences_sql(
    chunk: int = 2048,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the plain global-window prefix sum the distributed
    bucket decomposition must equal."""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id,
             len(regexp_extract_all({text_col}, '{BPE_RE}')) AS n_tokens
      FROM {table}),
    pre AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM toks)
    SELECT doc_id, n_tokens, start_tok::BIGINT AS start_tok,
           (start_tok // {chunk})::BIGINT AS seq_first,
           ((start_tok + GREATEST(n_tokens, 1) - 1) // {chunk})::BIGINT
             AS seq_last
    FROM pre
    """


QUOTA_SALT = "quota"


def quota_sample(
    docs_in: DataFrame,
    quotas: Dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = QUOTA_SALT,
) -> DataFrame:
    """Exact-count mixture sampling — the data-mixing op of a pretraining
    pipeline: hit a TARGET document count per stratum (domain/language),
    not a rate.  Each stratum's rows are ranked by the deterministic
    sample key (doc_id tiebreak — md5_60 % 1e6 keys do collide at corpus
    scale) and the top ``quotas[stratum]`` survive; strata outside the
    quota map contribute nothing.

    Spark-first top-k-per-group: the rank filter against the CONSTANT
    ``max(quotas)`` comes first, so Spark 4's WindowGroupLimit rewrite
    installs per-partition top-k heaps BELOW the exchange — only ~quota
    rows per stratum per partition ever shuffle, regardless of corpus
    size.  The per-stratum quota (a when-chain, not a join) then trims the
    survivors.  Output: (doc_id, stratum, sample_key, rnk).
    """
    if not quotas:
        raise ValueError("quotas must be non-empty")
    max_q = max(quotas.values())
    quota = F.lit(0)
    for s in sorted(quotas):  # deterministic build order
        quota = F.when(F.col("stratum") == s, F.lit(quotas[s])).otherwise(quota)
    base = fan_out(docs_in).select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        sample_key(F.col(id_col), salt).alias("sample_key"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("stratum").orderBy("sample_key", "doc_id")
    )
    return (
        base.withColumn("rnk", rnk)
        .where(F.col("rnk") <= F.lit(max_q))
        .withColumn("_q", quota)
        .where(F.col("rnk") <= F.col("_q"))
        .select("doc_id", "stratum", "sample_key",
                F.col("rnk").cast("long").alias("rnk"))
    )


def quota_sample_sql(
    quotas: Dict[str, int],
    table: str = "documents",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = QUOTA_SALT,
) -> str:
    """DuckDB twin of :func:`quota_sample` (identical key, rank order and
    per-stratum CASE quota)."""
    key = (
        f"('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {SAMPLE_MOD}"
    )
    whens = " ".join(f"WHEN '{s}' THEN {quotas[s]}" for s in sorted(quotas))
    return f"""
    WITH ranked AS (
      SELECT {id_col} AS doc_id, {stratum_col} AS stratum,
             {key} AS sample_key,
             ROW_NUMBER() OVER (
               PARTITION BY {stratum_col}
               ORDER BY {key}, {id_col}) AS rnk
      FROM {table})
    SELECT doc_id, stratum, sample_key, rnk
    FROM ranked
    WHERE rnk <= CASE stratum {whens} ELSE 0 END
    """


# ---------------------------------------------------------------------------
# Deterministic cross-validation split
# ---------------------------------------------------------------------------

CV_SALT = "cv"
CV_BOUNDS = (80, 90)  # md5 bucket < 80 -> train, < 90 -> val, else test


def crossval_split(
    docs_in: DataFrame,
    bounds: tuple = CV_BOUNDS,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = CV_SALT,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket =
    ``md5_60('cv:' || doc_id) % 100``; bucket < bounds[0] -> train,
    < bounds[1] -> val, else test.  The split is a pure function of the
    row id — reproducible across runs, resumes, cluster sizes and engines,
    and STABLE UNDER APPEND: new documents never move an existing row to a
    different split (the property k-fold-by-row-number lacks).  Pure
    map-side projection, zero shuffles.  Output: (doc_id, stratum, bucket,
    split)."""
    bucket = F.pmod(
        md5_60_expr(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ),
        F.lit(100),
    )
    return fan_out(docs_in).select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        bucket.alias("bucket"),
        F.when(bucket < bounds[0], "train")
        .when(bucket < bounds[1], "val")
        .otherwise("test")
        .alias("split"),
    )


def crossval_split_sql(
    bounds: tuple = CV_BOUNDS,
    table: str = "documents",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = CV_SALT,
) -> str:
    """DuckDB twin of :func:`crossval_split` (identical bucket expression)."""
    key = (
        f"('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        f"::BIGINT % 100"
    )
    return f"""
    SELECT doc_id, stratum, bucket,
           CASE WHEN bucket < {bounds[0]} THEN 'train'
                WHEN bucket < {bounds[1]} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT {id_col} AS doc_id, {stratum_col} AS stratum, {key} AS bucket
      FROM {table})
    """


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (mT5-style alpha = 0.5)
# ---------------------------------------------------------------------------

MIX_BUDGET = 100
MIX_SALT = "mix"


def temperature_mixture(
    docs_in: DataFrame,
    budget: int = MIX_BUDGET,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = MIX_SALT,
) -> DataFrame:
    """Temperature-scaled data mixing (the mT5/XLM-R alpha = 0.5 recipe):
    each stratum's share of a fixed document budget is proportional to
    ``sqrt(n_stratum)`` rather than ``n_stratum``, up-weighting tail
    languages that proportional sampling starves.

    Weights stay cross-engine exact: IEEE-754 requires sqrt to be
    correctly rounded, and ``floor(sqrt(BIGINT))`` of a < 2^53 count is
    therefore identical in any engine; quotas are BIGINT floor allocations
    ``(budget * w) div sum_w`` (the documented bias: floor allocation can
    undershoot the budget by < n_strata rows, never overshoot).  Row
    selection reuses the quota_sample shape — rank by the deterministic
    md5 sample key, constant-budget rank filter FIRST so WindowGroupLimit
    installs map-side heaps, then the per-stratum quota join (computed,
    so a when-chain can't express it).  Output: (doc_id, stratum, rnk,
    quota)."""
    counts = fan_out(docs_in).groupBy(
        F.col(stratum_col).alias("stratum")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = counts.select(
        "stratum", F.floor(F.sqrt(F.col("n"))).cast("long").alias("w")
    )
    tot = w.agg(F.sum("w").alias("sum_w"))
    quotas = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.expr(f"({budget} * w) div sum_w").alias("quota"),
        )
    )
    base = fan_out(docs_in).select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        sample_key(F.col(id_col), salt).alias("sample_key"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("stratum").orderBy("sample_key", "doc_id")
    )
    return (
        base.withColumn("rnk", rnk)
        .where(F.col("rnk") <= F.lit(budget))  # constant cap -> group limit
        .join(F.broadcast(quotas), "stratum")
        .where(F.col("rnk") <= F.col("quota"))
        .select("doc_id", "stratum", F.col("rnk").cast("long").alias("rnk"),
                "quota")
    )


def temperature_mixture_sql(
    budget: int = MIX_BUDGET,
    table: str = "documents",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = MIX_SALT,
) -> str:
    """DuckDB twin of :func:`temperature_mixture` (identical weights,
    floor allocation, rank order)."""
    key = (
        f"('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {SAMPLE_MOD}"
    )
    return f"""
    WITH counts AS (
      SELECT {stratum_col} AS stratum, COUNT(*)::BIGINT AS n
      FROM {table} GROUP BY 1),
    w AS (SELECT stratum, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w FROM counts),
    quotas AS (
      SELECT stratum, (({budget} * w) // (SELECT SUM(w) FROM w))::BIGINT AS quota
      FROM w),
    ranked AS (
      SELECT {id_col} AS doc_id, {stratum_col} AS stratum,
             ROW_NUMBER() OVER (PARTITION BY {stratum_col}
                                ORDER BY {key}, {id_col}) AS rnk
      FROM {table})
    SELECT r.doc_id, r.stratum, r.rnk, q.quota
    FROM ranked r JOIN quotas q USING (stratum)
    WHERE r.rnk <= q.quota
    """


RESERVOIR_K = 12
RESERVOIR_SALTS = 8
ARES_SALT = "ares"
TWO_POW_60 = float(1 << 60)


def weighted_reservoir(
    docs_in: DataFrame,
    k: int = RESERVOIR_K,
    n_salts: int = RESERVOIR_SALTS,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = ARES_SALT,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    keep the top-``k`` documents per stratum ranked by ``u^(1/w)`` — each
    doc's inclusion probability is proportional to its weight ``w`` (here
    the whitespace token count, the "sample long documents more" quality
    mix every pre-training data recipe needs), yet the draw is a one-pass
    rank, not an accept/reject loop.

    Determinism discipline: the "random" ``u`` is the house md5_60 hash of
    the doc id mapped into (0, 1] — no RNG state, so the sample is
    identical across runs, resumes, cluster sizes and engines.  The rank
    key ``ln(u)/w`` (monotone in u^(1/w)) is snapped to an integer
    nano-grid with the shared half-away ROUND before ORDERING, and ties
    break on doc_id, so a last-ulp ln() divergence between engines cannot
    reorder the sample.

    Scale shape — top-k per group WITHOUT sorting the stratum: the corpus
    is first ranked inside (stratum, salt) slices (``n_salts`` deterministic
    hash salts, so each window task sorts ~1/n_salts of a stratum and the
    constant rank cap installs WindowGroupLimit map-side heaps), then only
    the <= n_salts*k survivors per stratum take the final stratum-wide
    rank — a frame that no longer grows with the corpus.  Two-phase top-k
    equals global top-k because every stage-1 slice retains its own top-k,
    a superset of its contribution to the stratum's top-k.

    Output: (stratum, doc_id, weight, key_nano, rnk).
    Reference analog: none (engine-supplied pipeline component).
    """
    h = md5_60_expr(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = F.size(F.split(F.col(text_col), " ")).cast("long")
    # u = (h+1)/2^60 in (0,1]; key = ln(u)/w, snapped half-away to nanos
    key_nano = F.round(
        F.log((h + F.lit(1)).cast("double") / F.lit(TWO_POW_60))
        / w.cast("double")
        * F.lit(1e9)
    ).cast("long")
    base = fan_out(docs_in).select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        w.alias("weight"),
        key_nano.alias("key_nano"),
        F.pmod(
            md5_60_expr(
                F.concat(F.lit("salt:"), F.col(id_col).cast("string"))
            ),
            F.lit(n_salts),
        ).alias("_slice"),
    )
    slice_rn = F.row_number().over(
        Window.partitionBy("stratum", "_slice")
        .orderBy(F.col("key_nano").desc(), "doc_id")
    )
    survivors = (
        base.withColumn("_rn", slice_rn)
        .where(F.col("_rn") <= F.lit(k))  # constant cap -> group limit
        .drop("_rn", "_slice")
    )
    rnk = F.row_number().over(
        Window.partitionBy("stratum")
        .orderBy(F.col("key_nano").desc(), "doc_id")
    )
    return (
        survivors.withColumn("rnk", rnk.cast("long"))
        .where(F.col("rnk") <= F.lit(k))
    )


def weighted_reservoir_sql(
    k: int = RESERVOIR_K,
    table: str = "documents",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = ARES_SALT,
) -> str:
    """DuckDB twin of :func:`weighted_reservoir` — the plain one-window
    per-stratum top-k the two-phase plan must equal (identical hash,
    identical snapped key, identical tiebreak)."""
    h = (
        f"('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        f"::BIGINT"
    )
    return f"""
    WITH keyed AS (
      SELECT {stratum_col} AS stratum, {id_col} AS doc_id,
             len(string_split({text_col}, ' '))::BIGINT AS weight,
             CAST(ROUND(
               LN((({h}) + 1)::DOUBLE / {TWO_POW_60!r})
               / len(string_split({text_col}, ' '))::DOUBLE * 1e9
             ) AS BIGINT) AS key_nano
      FROM {table}),
    ranked AS (
      SELECT stratum, doc_id, weight, key_nano,
             ROW_NUMBER() OVER (PARTITION BY stratum
                                ORDER BY key_nano DESC, doc_id) AS rnk
      FROM keyed)
    SELECT stratum, doc_id, weight, key_nano, rnk
    FROM ranked WHERE rnk <= {k}
    """
