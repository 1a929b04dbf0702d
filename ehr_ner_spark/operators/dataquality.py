"""Functional-dependency audit — the data-quality gate a pipeline runs
before trusting a column as a join/canonicalization key: for each
candidate FD ``X -> Y``, measure how badly the data violates it.

Per FD the audit reports the g3 error (Kivinen & Mannila: the minimum
fraction of rows to delete so the FD holds exactly — computed as
``1 - sum over keys of max same-Y group size / n_rows``), plus the raw
key / violating-key / violating-row counts.

Spark-first shape, 100-TB story: each FD is TWO map-side-combined
aggregations — counts by (X, Y), then per-X roll-up (sum, max, distinct-Y
count arrives free as COUNT(*) of the (X, Y) groups) — and one global
single-row reduce.  The shuffle carries the (X, Y) group frame, never raw
rows; skewed X keys only imbalance the second (already-reduced) stage.
Everything is a BIGINT until the final g3 division, snapped to the shared
1e-6 half-away grid, so the DuckDB twin is exact.

Reference contact: none (data-quality family; the audit complements the
canonical-key election of operators/linking.py, which assumes
surface -> canonical is functional).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (label, table, X, Y) — the three audited dependencies: one that holds
# by construction (unique key), two genuinely violated behavioural FDs.
FDS = [
    ("customer.c_custkey->c_mktsegment", "customer",
     "c_custkey", "c_mktsegment"),
    ("orders.o_custkey->o_orderpriority", "orders",
     "o_custkey", "o_orderpriority"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
]


def _audit_one(df: DataFrame, label: str, x: str, y: str) -> DataFrame:
    groups = df.groupBy(
        F.col(x).alias("_x"), F.col(y).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_key = groups.groupBy("_x").agg(
        F.sum("_n").alias("_rows"),
        F.max("_n").alias("_max"),
        F.count(F.lit(1)).alias("_ny"),
    )
    return per_key.agg(
        F.lit(label).alias("fd"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("_ny") > 1).cast("long")).alias("n_violating_keys"),
        F.sum("_rows").alias("n_rows"),
        F.sum(F.col("_rows") - F.col("_max")).alias("n_violating_rows"),
        (
            F.floor(
                F.sum(F.col("_rows") - F.col("_max")).cast("double")
                / F.sum("_rows") * F.lit(1000000.0) + F.lit(0.5)
            ) / F.lit(1000000.0)
        ).alias("g3_error"),
    )


def fd_violations(tables: dict) -> DataFrame:
    """{table_name: DataFrame} -> one audit row per FD in FDS."""
    parts = [
        _audit_one(tables[t], label, x, y) for label, t, x, y in FDS
    ]
    return reduce(DataFrame.unionByName, parts)


def fd_violations_sql() -> str:
    """DuckDB twin: same two-level aggregation per FD, UNION ALL."""
    parts = []
    for label, t, x, y in FDS:
        parts.append(f"""
    SELECT '{label}' AS fd,
           COUNT(*) AS n_keys,
           SUM((_ny > 1)::BIGINT)::BIGINT AS n_violating_keys,
           SUM(_rows)::BIGINT AS n_rows,
           SUM(_rows - _max)::BIGINT AS n_violating_rows,
           FLOOR(SUM(_rows - _max)::DOUBLE / SUM(_rows)
                 * 1000000.0 + 0.5) / 1000000.0 AS g3_error
    FROM (
      SELECT _x, SUM(_n) AS _rows, MAX(_n) AS _max, COUNT(*) AS _ny
      FROM (SELECT {x} AS _x, {y} AS _y, COUNT(*) AS _n
            FROM {t} GROUP BY 1, 2)
      GROUP BY _x)""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# round(10000 * log10(1 + 1/d)) for d = 1..9 — embedded as integer literals
# so neither engine evaluates a logarithm at query time
BENFORD_BP = (3010, 1761, 1249, 969, 792, 669, 580, 512, 458)


def benford_audit(orders: DataFrame,
                  amount_col: str = "o_totalprice") -> DataFrame:
    """Benford's-law first-significant-digit audit over order amounts —
    the classic fraud / synthetic-data screen: natural multiplicative
    amounts follow P(d) = log10(1 + 1/d); fabricated or truncated data
    does not.

    Everything is integer-exact: amounts enter as ROUND half-away cents,
    the first significant digit is a substring of the BIGINT's decimal
    form (leading digit of cents == leading significant digit of the
    amount), shares are basis points by integer DIV, and the expected
    Benford shares are pre-computed integer literals — no engine ever
    takes a log.  One map-only digit projection + one 9-group aggregate;
    the total arrives by a broadcast cross join of the one-row count, so
    the exchange carries 9 rows past the first combine.

    Output: (digit, n, share_bp, expected_bp, dev_bp) for digits 1..9.
    Reference analog: none (data-quality family, like the g3 FD audit).
    """
    from .parallelism import fan_out

    cents = F.round(F.col(amount_col) * 100).cast("long")
    digits = fan_out(orders).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = digits.agg(F.count(F.lit(1)).alias("_total"))
    expected = F.create_map(
        *[x for d, bp in enumerate(BENFORD_BP, start=1)
          for x in (F.lit(d), F.lit(bp))]
    )
    share = F.expr("(10000 * n) DIV _total")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            share.alias("share_bp"),
            expected[F.col("digit")].cast("long").alias("expected_bp"),
            F.abs(share - expected[F.col("digit")]).cast("long")
            .alias("dev_bp"),
        )
    )


def benford_audit_sql(table: str = "orders",
                      amount_col: str = "o_totalprice") -> str:
    """DuckDB twin of :func:`benford_audit` (identical cents rounding,
    identical integer shares and literal expectations)."""
    whens = " ".join(
        f"WHEN {d} THEN {bp}" for d, bp in enumerate(BENFORD_BP, start=1)
    )
    return f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND({amount_col} * 100) AS BIGINT)
                         AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM {table}),
    counts AS (
      SELECT digit, COUNT(*)::BIGINT AS n FROM digits GROUP BY digit),
    t AS (SELECT COUNT(*)::BIGINT AS total FROM digits)
    SELECT digit, n,
           (10000 * n) // total AS share_bp,
           (CASE digit {whens} END)::BIGINT AS expected_bp,
           ABS((10000 * n) // total
               - CASE digit {whens} END)::BIGINT AS dev_bp
    FROM counts, t
    """


# ---------------------------------------------------------------------------
# Near-duplicate train/test leakage audit
# ---------------------------------------------------------------------------


def split_leakage(docs: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Train/test LEAKAGE audit: which MinHash/LSH near-duplicate pairs
    straddle the deterministic train/val/test split — the contamination
    every held-out evaluation silently inherits when dedup runs before
    (or never meets) the splitter.

    Spark-first shape: because the split is a PURE HASH of the doc id
    (sampling.crossval_split), each pair's two fold labels are map-only
    expressions over the pairs frame itself — the corpus is never joined
    back, so the audit costs nothing beyond the pair generation it
    audits.  Folds are normalized (lexicographic lo/hi) so the src<dst
    pair orientation cannot split groups.

    Output: (split_lo, split_hi, n_pairs, leaky) — one row per fold
    combination with any near-dup pair; ``leaky`` marks cross-fold rows.
    """
    from ..hashing import md5_60_expr
    from .dedup import minhash_lsh_pairs
    from .sampling import CV_BOUNDS, CV_SALT

    def _split(col):
        bucket = F.pmod(
            md5_60_expr(F.concat(F.lit(CV_SALT + ":"), col.cast("string"))),
            F.lit(100),
        )
        return (
            F.when(bucket < CV_BOUNDS[0], "train")
            .when(bucket < CV_BOUNDS[1], "val")
            .otherwise("test")
        )

    pairs = minhash_lsh_pairs(docs, threshold=threshold)
    sa, sb = _split(F.col("src")), _split(F.col("dst"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn("leaky", F.col("split_lo") != F.col("split_hi"))
    )


def split_leakage_sql(threshold: float = 0.4) -> str:
    """DuckDB twin of :func:`split_leakage`: the minhash pairs twin CTE
    plus the identical split expression on both endpoints."""
    from .dedup import minhash_pairs_sql
    from .sampling import CV_BOUNDS, CV_SALT

    def _split(col):
        key = (
            f"('0x' || substr(md5('{CV_SALT}:' || CAST({col} AS VARCHAR)),"
            f" 1, 15))::BIGINT % 100"
        )
        return (
            f"CASE WHEN {key} < {CV_BOUNDS[0]} THEN 'train' "
            f"WHEN {key} < {CV_BOUNDS[1]} THEN 'val' ELSE 'test' END"
        )

    return f"""
    WITH pairs AS ({minhash_pairs_sql(threshold)})
    SELECT split_lo, split_hi, COUNT(*)::BIGINT AS n_pairs,
           split_lo <> split_hi AS leaky
    FROM (
      SELECT LEAST({_split('src')}, {_split('dst')}) AS split_lo,
             GREATEST({_split('src')}, {_split('dst')}) AS split_hi
      FROM pairs)
    GROUP BY split_lo, split_hi
    """


# ---------------------------------------------------------------------------
# distribution drift (total-variation distance between corpus folds)
# ---------------------------------------------------------------------------

DRIFT_SALT = "drift"
DRIFT_BUCKET_CHARS = 32
DRIFT_N_BUCKETS = 20
DRIFT_FLAG_BP = 100  # flag a bucket when its share moved > 1 pp


def distribution_drift(docs: DataFrame) -> DataFrame:
    """Distribution-drift audit between two deterministic corpus folds —
    the monitor that catches "the incoming batch is not like the training
    corpus" (the log-free stand-in for PSI: total-variation distance in
    integer basis points, so both engines agree exactly).

    Folds are a pure hash of the doc id (the crossval discipline, its own
    salt); the compared statistic is the doc-length histogram over
    DRIFT_N_BUCKETS fixed-width buckets.  Shares are truncated to integer
    bp by spec — the metric is DEFINED on the truncated shares, which
    keeps every comparison integer.

    Scale shape: fold + bucket are map-only expressions; ONE map-side-
    combined (bucket, fold) aggregate; everything after runs on the
    <= DRIFT_N_BUCKETS-row frame, with the fold totals and the one-row
    TVD arriving by broadcast.

    Output: (bucket, n_a, n_b, share_a_bp, share_b_bp, abs_diff_bp,
    drifted, tvd_bp).
    """
    from ..hashing import md5_60_expr

    b = docs.select(
        F.least(
            (F.col("n_chars") / DRIFT_BUCKET_CHARS).cast("long"),
            F.lit(DRIFT_N_BUCKETS - 1),
        ).alias("bucket"),
        (
            md5_60_expr(
                F.concat(
                    F.lit(DRIFT_SALT + ":"), F.col("doc_id").cast("string")
                )
            )
            % 2
        ).alias("fold"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("fold") == 0, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("fold") == 1, 1).otherwise(0))
        .cast("long").alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").cast("long").alias("tot_a"),
        F.sum("n_b").cast("long").alias("tot_b"),
    )
    shares = (
        counts.crossJoin(F.broadcast(tot))
        # an EMPTY fold has zero mass in every bucket by definition (the
        # lazy CASE keeps ANSI division-by-zero out of both engines);
        # anything vs an empty fold then reads tvd_bp = 5000
        .withColumn(
            "share_a_bp",
            F.when(F.col("tot_a") == 0, F.lit(0))
            .otherwise(F.floor(F.lit(10000) * F.col("n_a") / F.col("tot_a")))
            .cast("long"),
        )
        .withColumn(
            "share_b_bp",
            F.when(F.col("tot_b") == 0, F.lit(0))
            .otherwise(F.floor(F.lit(10000) * F.col("n_b") / F.col("tot_b")))
            .cast("long"),
        )
        .withColumn(
            "abs_diff_bp",
            F.abs(F.col("share_a_bp") - F.col("share_b_bp")),
        )
    )
    tvd = shares.agg(
        (F.sum("abs_diff_bp") / 2).cast("long").alias("tvd_bp")
    )
    return shares.crossJoin(F.broadcast(tvd)).select(
        "bucket",
        "n_a",
        "n_b",
        "share_a_bp",
        "share_b_bp",
        "abs_diff_bp",
        (F.col("abs_diff_bp") > DRIFT_FLAG_BP).alias("drifted"),
        "tvd_bp",
    )


def distribution_drift_sql(table: str = "documents") -> str:
    """DuckDB twin — identical fold hash, buckets, truncation and TVD."""
    fold = (
        f"('0x' || substr(md5('{DRIFT_SALT}:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15))::BIGINT % 2"
    )
    return f"""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(n_chars / {DRIFT_BUCKET_CHARS}) AS BIGINT),
                   {DRIFT_N_BUCKETS - 1}) AS bucket,
             {fold} AS fold
      FROM {table}),
    counts AS (
      SELECT bucket,
             SUM(CASE WHEN fold = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             SUM(CASE WHEN fold = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
      FROM b GROUP BY 1),
    tot AS (SELECT SUM(n_a)::BIGINT AS tot_a, SUM(n_b)::BIGINT AS tot_b
            FROM counts),
    shares AS (
      SELECT bucket, n_a, n_b,
             CASE WHEN tot_a = 0 THEN 0
                  ELSE CAST(FLOOR(10000 * n_a / tot_a) AS BIGINT)
             END AS share_a_bp,
             CASE WHEN tot_b = 0 THEN 0
                  ELSE CAST(FLOOR(10000 * n_b / tot_b) AS BIGINT)
             END AS share_b_bp
      FROM counts CROSS JOIN tot),
    tvd AS (
      SELECT CAST(FLOOR(SUM(ABS(share_a_bp - share_b_bp)) / 2) AS BIGINT)
               AS tvd_bp
      FROM shares)
    SELECT bucket, n_a, n_b, share_a_bp, share_b_bp,
           ABS(share_a_bp - share_b_bp) AS abs_diff_bp,
           ABS(share_a_bp - share_b_bp) > {DRIFT_FLAG_BP} AS drifted,
           tvd_bp
    FROM shares CROSS JOIN tvd
    """


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift (binless companion to the TVD audit)

KS_SALT = "ksdrift"


def ks_drift(docs: DataFrame) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the doc-length
    distributions of two pure-hash corpus folds — the binless companion to
    :func:`distribution_drift`: TVD over fixed buckets can hide a shift
    that stays inside one bucket; the KS sup-CDF gap cannot.

    The statistic is DEFINED on bp-truncated integer CDFs (``floor(10000 *
    cum / tot)``, the drift-family discipline), so both engines agree
    exactly; an empty fold has an all-zero CDF by definition, so
    anything-vs-empty reads ``ks_bp = 10000``.

    Scale shape: fold is a map-only hash; ONE map-side-combined aggregate
    reduces the corpus to <= |distinct n_chars| rows — bounded by the
    length domain (the content cap), NOT the corpus size — and the
    cumulative window + argmax ranking run on that aggregated frame with
    the fold totals broadcast.

    Output: one row ``(ks_bp, ks_at_chars, n_lengths, tot_a, tot_b)`` —
    the sup gap in basis points, the smallest length attaining it, and the
    support/fold sizes.
    """
    from pyspark.sql import Window

    from ..hashing import md5_60_expr

    b = docs.select(
        F.col("n_chars").alias("x"),
        (
            md5_60_expr(
                F.concat(F.lit(KS_SALT + ":"), F.col("doc_id").cast("string"))
            )
            % 2
        ).alias("fold"),
    )
    counts = b.groupBy("x").agg(
        F.sum(F.when(F.col("fold") == 0, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("fold") == 1, 1).otherwise(0))
        .cast("long").alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").cast("long").alias("tot_a"),
        F.sum("n_b").cast("long").alias("tot_b"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cdf = (
        counts.withColumn("cum_a", F.sum("n_a").over(w).cast("long"))
        .withColumn("cum_b", F.sum("n_b").over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "cdf_a_bp",
            F.when(F.col("tot_a") == 0, F.lit(0))
            .otherwise(
                F.floor(F.lit(10000) * F.col("cum_a") / F.col("tot_a"))
            )
            .cast("long"),
        )
        .withColumn(
            "cdf_b_bp",
            F.when(F.col("tot_b") == 0, F.lit(0))
            .otherwise(
                F.floor(F.lit(10000) * F.col("cum_b") / F.col("tot_b"))
            )
            .cast("long"),
        )
        .withColumn("diff", F.abs(F.col("cdf_a_bp") - F.col("cdf_b_bp")))
    )
    ranked = cdf.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("diff").desc(), F.col("x").asc())
        ),
    )
    stats = cdf.agg(F.count(F.lit(1)).cast("long").alias("n_lengths"))
    return (
        ranked.filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("diff").alias("ks_bp"),
            F.col("x").alias("ks_at_chars"),
            "n_lengths",
            "tot_a",
            "tot_b",
        )
    )


def ks_drift_sql(table: str = "documents") -> str:
    """DuckDB twin — identical fold hash, truncated CDFs and tie-break."""
    fold = (
        f"('0x' || substr(md5('{KS_SALT}:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15))::BIGINT % 2"
    )
    return f"""
    WITH b AS (
      SELECT n_chars AS x, {fold} AS fold FROM {table}),
    counts AS (
      SELECT x,
             SUM(CASE WHEN fold = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             SUM(CASE WHEN fold = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
      FROM b GROUP BY 1),
    tot AS (SELECT SUM(n_a)::BIGINT AS tot_a, SUM(n_b)::BIGINT AS tot_b
            FROM counts),
    cdf AS (
      SELECT x,
             SUM(n_a) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cum_a,
             SUM(n_b) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cum_b
      FROM counts),
    d AS (
      SELECT x,
             ABS(CASE WHEN tot_a = 0 THEN 0
                      ELSE CAST(FLOOR(10000 * cum_a / tot_a) AS BIGINT) END
               - CASE WHEN tot_b = 0 THEN 0
                      ELSE CAST(FLOOR(10000 * cum_b / tot_b) AS BIGINT) END)
               AS diff,
             tot_a, tot_b
      FROM cdf CROSS JOIN tot),
    ranked AS (
      SELECT diff, x, tot_a, tot_b,
             ROW_NUMBER() OVER (ORDER BY diff DESC, x ASC) AS rn
      FROM d),
    stats AS (SELECT COUNT(*)::BIGINT AS n_lengths FROM d)
    SELECT diff AS ks_bp, x AS ks_at_chars, n_lengths, tot_a, tot_b
    FROM ranked CROSS JOIN stats
    WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Inclusion-dependency / foreign-key discovery (schema profiling)
# ---------------------------------------------------------------------------

FK_CANDIDATES = [
    # (child_table, child_col, parent_table, parent_col) — true FKs plus
    # deliberate negatives the discovery must reject
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),     # negative
    ("customer", "c_custkey", "nation", "n_nationkey"),    # negative
]


def fk_discovery(tables: dict, candidates=None) -> DataFrame:
    """Inclusion-dependency (foreign-key) discovery — the schema-profiling
    pass (Metanome-style IND mining over a candidate lattice) that infers
    referential structure from DATA, not declared constraints: for each
    candidate (child.col -> parent.col) report

    - ``n_child_keys`` / ``n_parent_keys``: distinct key counts;
    - ``n_orphans``: distinct child keys absent from the parent (an FK
      holds iff 0);
    - ``containment_micro``: the inclusion coefficient
      |child ∩ parent| / |child| on the 1e-6 floor grid;
    - ``is_fk``: the verdict.

    Scale shape: each side reduces to its DISTINCT key frame FIRST
    (map-side-combined), so the orphan check is an anti-join between two
    key-cardinality-bounded frames — never between raw tables; the
    candidate list is a fixed lattice, so the whole audit is |candidates|
    independent small joins.  Output one row per candidate."""
    from functools import reduce

    candidates = candidates or FK_CANDIDATES
    outs = []
    for child_t, child_c, parent_t, parent_c in candidates:
        ck = tables[child_t].select(F.col(child_c).alias("k")).where(
            F.col("k").isNotNull()
        ).distinct()
        pk = tables[parent_t].select(F.col(parent_c).alias("k")).where(
            F.col("k").isNotNull()
        ).distinct()
        ck = ck.persist()
        n_child = ck.count()
        orphans = ck.join(pk, "k", "left_anti")
        row = (
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(pk.agg(F.count(F.lit(1)).alias("n_parent_keys")))
            .select(
                F.lit(f"{child_t}.{child_c}").alias("child"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent"),
                F.lit(n_child).cast("long").alias("n_child_keys"),
                "n_parent_keys",
                "n_orphans",
                F.floor(
                    (F.lit(n_child) - F.col("n_orphans"))
                    / F.lit(n_child) * F.lit(1000000.0)
                ).cast("long").alias("containment_micro"),
                (F.col("n_orphans") == 0).alias("is_fk"),
            )
        )
        outs.append(row)
    return reduce(lambda a, b: a.unionAll(b), outs)


def fk_discovery_sql(candidates=None) -> str:
    """DuckDB twin: same candidate lattice, distinct-key anti-join
    counts, floor-grid containment."""
    candidates = candidates or FK_CANDIDATES
    blocks = []
    for child_t, child_c, parent_t, parent_c in candidates:
        blocks.append(f"""
    SELECT '{child_t}.{child_c}' AS child,
           '{parent_t}.{parent_c}' AS parent,
           (SELECT COUNT(DISTINCT {child_c}) FROM {child_t}
             WHERE {child_c} IS NOT NULL)::BIGINT AS n_child_keys,
           (SELECT COUNT(DISTINCT {parent_c}) FROM {parent_t}
             WHERE {parent_c} IS NOT NULL)::BIGINT AS n_parent_keys,
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT {child_c} AS k FROM {child_t}
                WHERE {child_c} IS NOT NULL) c
             WHERE NOT EXISTS (
               SELECT 1 FROM {parent_t} p
                WHERE p.{parent_c} = c.k))::BIGINT AS n_orphans,
           FLOOR(((SELECT COUNT(DISTINCT {child_c}) FROM {child_t}
                    WHERE {child_c} IS NOT NULL)
                  - (SELECT COUNT(*) FROM
                       (SELECT DISTINCT {child_c} AS k FROM {child_t}
                         WHERE {child_c} IS NOT NULL) c
                      WHERE NOT EXISTS (
                        SELECT 1 FROM {parent_t} p
                         WHERE p.{parent_c} = c.k)))
                 / (SELECT COUNT(DISTINCT {child_c}) FROM {child_t}
                     WHERE {child_c} IS NOT NULL)
                 * 1000000.0)::BIGINT AS containment_micro,
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT {child_c} AS k FROM {child_t}
                WHERE {child_c} IS NOT NULL) c
             WHERE NOT EXISTS (
               SELECT 1 FROM {parent_t} p
                WHERE p.{parent_c} = c.k)) = 0 AS is_fk""")
    return "\n    UNION ALL".join(blocks)
