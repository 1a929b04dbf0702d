"""Exact grouped descriptive statistics over money/quantity columns: Pearson
correlation + OLS slope from integer moments, and an equi-width histogram
with integer bucket arithmetic.

Both operators follow the engine's integer-moments discipline (SURVEY §2.4,
reference analog: the corpus count/sum matrix in ``dataPipeline.py``): every
SUM that feeds a float formula is a BIGINT over cent-scaled values, so the
shuffled partial aggregates are exact and combinable (map-side combine, one
key-local Exchange, no second pass), and the only floating-point arithmetic
is the final per-group formula over already-exact integers — which is
IEEE-identical between Spark and the DuckDB twin.

Scale notes (100 TB):

* ``grouped_corr`` is a single ``groupBy(key)`` over six combinable SUMs —
  the exchange carries one row per (partition, key).  The BIGINT moment
  bound: |xy| <= 50 * 10_499_788 cents ~ 5.2e8 per row, so the partial sums
  stay exact past 1.7e10 rows per group; the n*Sxy cross-terms in the final
  formula are computed in DOUBLE (they exceed int64 at petabyte group
  sizes, and the formula is a ratio — float is the right type there).
* ``equiwidth_histogram`` derives the bucket with pure integer DIV on
  cents — codegen column arithmetic, no window, no second scan for min/max
  (bounds are caller-fixed, as a production profiler would fix them from
  table stats) — then ONE key-local count/sum aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Final-formula rounding: half-AWAY-from-zero at 6 dp on both engines
# (Python round() is half-to-even, SQL ROUND is half-away — see
# similarity.round_half_away_3).
_R6 = "FLOOR(({x}) * 1e6 + 0.5) / 1e6"


def _r6(col):
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def grouped_corr(
    lineitem: DataFrame,
    key: str = "l_returnflag",
    x: str = "l_quantity",
    y: str = "l_extendedprice",
) -> DataFrame:
    """Per-``key`` Pearson correlation, covariance and OLS slope of
    cent-scaled ``y`` on ``x``, from six exact BIGINT moments.

    Emits ``(key, n, corr, cov, slope)`` where cov/slope are in
    (unit_x × cents) space — deterministic, engine-identical values.
    """
    xc = F.round(F.col(x) * 100).cast("long").alias("_x")
    yc = F.round(F.col(y) * 100).cast("long").alias("_y")
    m = lineitem.select(F.col(key), xc, yc).groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov_num = n * F.col("_sxy").cast("double") - sx * sy
    var_x = n * F.col("_sxx").cast("double") - sx * sx
    var_y = n * F.col("_syy").cast("double") - sy * sy
    return m.select(
        F.col(key),
        F.col("n"),
        _r6(cov_num / F.sqrt(var_x * var_y)).alias("corr"),
        _r6(cov_num / (n * n)).alias("cov"),
        _r6(cov_num / var_x).alias("slope"),
    )


def grouped_corr_sql(
    table_sql: str,
    key: str = "l_returnflag",
    x: str = "l_quantity",
    y: str = "l_extendedprice",
) -> str:
    """DuckDB twin of :func:`grouped_corr` — identical integer moments,
    identical final DOUBLE formula, identical half-away rounding."""
    corr = _R6.format(x="cn / sqrt(vx * vy)")
    cov = _R6.format(x="cn / (nd * nd)")
    slope = _R6.format(x="cn / vx")
    return f"""
    WITH t AS ({table_sql}),
    m AS (
      SELECT {key},
             COUNT(*)::BIGINT AS n,
             SUM(ROUND({x} * 100)::BIGINT)::BIGINT AS sx,
             SUM(ROUND({y} * 100)::BIGINT)::BIGINT AS sy,
             SUM(ROUND({x} * 100)::BIGINT * ROUND({x} * 100)::BIGINT)::BIGINT
               AS sxx,
             SUM(ROUND({y} * 100)::BIGINT * ROUND({y} * 100)::BIGINT)::BIGINT
               AS syy,
             SUM(ROUND({x} * 100)::BIGINT * ROUND({y} * 100)::BIGINT)::BIGINT
               AS sxy
      FROM t GROUP BY 1),
    d AS (
      SELECT {key}, n,
             n::DOUBLE AS nd,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cn,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS vx,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vy
      FROM m)
    SELECT {key}, n, {corr} AS corr, {cov} AS cov, {slope} AS slope
    FROM d
    """


HIST_BUCKET_CENTS = 500_000  # $5,000-wide buckets


def equiwidth_histogram(
    lineitem: DataFrame,
    col: str = "l_extendedprice",
    bucket_cents: int = HIST_BUCKET_CENTS,
) -> DataFrame:
    """Equi-width value histogram: ``(bucket, lo_dollars, hi_dollars, n,
    sum_cents)`` with the bucket id as pure integer DIV on cents.

    The bucket derivation is a codegen column expression (no UDF, no
    window, no preliminary min/max scan — fixed-width buckets are how a
    production profiler bins a column whose bounds come from table stats),
    and the aggregate is ONE combinable count/sum keyed by the bucket id:
    the exchange carries at most n_partitions × n_buckets rows.
    """
    cents = F.round(F.col(col) * 100).cast("long")
    # true integer DIV (float division + cast can misbucket boundary cents)
    b = F.expr(
        f"CAST(ROUND({col} * 100) AS BIGINT) DIV {bucket_cents}"
    ).alias("bucket")
    per_dollar = bucket_cents // 100
    out = (
        lineitem.select(b, cents.alias("_c"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("sum_cents"),
        )
    )
    return out.select(
        "bucket",
        (F.col("bucket") * per_dollar).cast("long").alias("lo_dollars"),
        ((F.col("bucket") + 1) * per_dollar).cast("long").alias("hi_dollars"),
        "n",
        "sum_cents",
    )


def equiwidth_histogram_sql(
    table_sql: str,
    col: str = "l_extendedprice",
    bucket_cents: int = HIST_BUCKET_CENTS,
) -> str:
    """DuckDB twin: identical integer DIV bucketing and BIGINT sums."""
    per_dollar = bucket_cents // 100
    return f"""
    WITH t AS ({table_sql}),
    c AS (
      SELECT ROUND({col} * 100)::BIGINT AS cents FROM t),
    g AS (
      SELECT cents // {bucket_cents} AS bucket,
             COUNT(*)::BIGINT AS n,
             SUM(cents)::BIGINT AS sum_cents
      FROM c GROUP BY 1)
    SELECT bucket, (bucket * {per_dollar})::BIGINT AS lo_dollars,
           ((bucket + 1) * {per_dollar})::BIGINT AS hi_dollars,
           n, sum_cents
    FROM g
    """
