"""Distributed multiple linear regression (2 features) from exact integer
moments — closed-form normal-equations solve, no iteration, no collect.

The reference's analytics stop at per-type count/sum matrices
(``data_process/dataPipeline.py``); a production curation pipeline also
fits cheap linear models on corpus statistics (e.g. price ~ quantity +
discount as the TPC-H stand-in here, or doc quality ~ length + entropy)
to rank and gate records.  This operator is the engine-native way to do
that at 100 TB: ONE ``groupBy(key)`` over ten combinable BIGINT moments
(map-side combine, a single key-local Exchange whose payload is one row
per (partition, key)), then the 2x2 centered normal equations are solved
per group in closed form (Cramer) — pure column arithmetic, no second
pass, no driver-side linear algebra.

Numeric discipline (the ``stats.grouped_corr`` contract, extended):

* every SUM is a BIGINT over integer-scaled values, so partial aggregates
  are exact and order-independent;
* ``y`` is whole DOLLARS (not cents): the binding moment is
  ``sum(y*y)`` <= n * (1.05e5)^2 ~ n * 1.1e10, exact in int64 past 8e8
  rows per group — cents would cap at ~8e4.  At petabyte group sizes the
  moments move to DECIMAL(38) / per-group sharding; documented, not
  needed at bench SFs;
* the only float arithmetic is the final per-group formula over
  already-exact integers, written with the SAME association order in
  Spark and the DuckDB twin (IEEE-identical), rounded half-away at 6 dp.

Model (per group g):  y = b0 + b1*x1 + b2*x2, minimizing SSE.
Centered system:  S11*b1 + S12*b2 = S1y ;  S12*b1 + S22*b2 = S2y
with Sij = n*sum(xi*xj) - sum(xi)*sum(xj).  R^2 = (b1*S1y + b2*S2y)/SST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import _R6, _r6


def multiple_regression(
    lineitem: DataFrame,
    key: str = "l_returnflag",
) -> DataFrame:
    """Per-``key`` OLS fit of whole-dollar extendedprice on
    (quantity, discount-in-percent): emits
    ``(key, n, b0, b1, b2, r2)`` — deterministic, engine-identical."""
    x1 = F.col("l_quantity").cast("long").alias("_x1")
    x2 = F.round(F.col("l_discount") * 100).cast("long").alias("_x2")
    y = F.round(F.col("l_extendedprice")).cast("long").alias("_y")
    m = lineitem.select(F.col(key), x1, x2, y).groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x1").alias("_sx1"),
        F.sum("_x2").alias("_sx2"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("_s11"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("_s12"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("_s22"),
        F.sum(F.col("_x1") * F.col("_y")).alias("_s1y"),
        F.sum(F.col("_x2") * F.col("_y")).alias("_s2y"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    sx1 = F.col("_sx1").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy = F.col("_sy").cast("double")
    # centered cross-moments: same n*sum - sum*sum shape as grouped_corr
    c = m.select(
        F.col(key), F.col("n"), nd.alias("_nd"),
        sx1.alias("_dx1"), sx2.alias("_dx2"), sy.alias("_dy"),
        (nd * F.col("_s11").cast("double") - sx1 * sx1).alias("_S11"),
        (nd * F.col("_s12").cast("double") - sx1 * sx2).alias("_S12"),
        (nd * F.col("_s22").cast("double") - sx2 * sx2).alias("_S22"),
        (nd * F.col("_s1y").cast("double") - sx1 * sy).alias("_S1y"),
        (nd * F.col("_s2y").cast("double") - sx2 * sy).alias("_S2y"),
        (nd * F.col("_syy").cast("double") - sy * sy).alias("_SST"),
    )
    det = F.col("_S11") * F.col("_S22") - F.col("_S12") * F.col("_S12")
    b = c.select(
        F.col(key), F.col("n"), "_nd", "_dx1", "_dx2", "_dy",
        "_S1y", "_S2y", "_SST",
        ((F.col("_S1y") * F.col("_S22") - F.col("_S2y") * F.col("_S12"))
         / det).alias("_b1"),
        ((F.col("_S2y") * F.col("_S11") - F.col("_S1y") * F.col("_S12"))
         / det).alias("_b2"),
    )
    return b.select(
        F.col(key), F.col("n"),
        _r6((F.col("_dy") - F.col("_b1") * F.col("_dx1")
             - F.col("_b2") * F.col("_dx2")) / F.col("_nd")).alias("b0"),
        _r6(F.col("_b1")).alias("b1"),
        _r6(F.col("_b2")).alias("b2"),
        _r6((F.col("_b1") * F.col("_S1y") + F.col("_b2") * F.col("_S2y"))
            / F.col("_SST")).alias("r2"),
    )


def multiple_regression_sql(key: str = "l_returnflag") -> str:
    """DuckDB twin of :func:`multiple_regression` — identical integer
    moments, identical DOUBLE association order, identical rounding."""
    b0 = _R6.format(x="(dy - b1 * dx1 - b2 * dx2) / nd")
    b1 = _R6.format(x="b1")
    b2 = _R6.format(x="b2")
    r2 = _R6.format(x="(b1 * s1yc + b2 * s2yc) / sst")
    return f"""
    WITH t AS (
      SELECT {key},
             CAST(l_quantity AS BIGINT)                  AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT)     AS x2,
             CAST(ROUND(l_extendedprice) AS BIGINT)      AS y
      FROM lineitem),
    m AS (
      SELECT {key},
             COUNT(*)::BIGINT AS n,
             SUM(x1)::BIGINT AS sx1, SUM(x2)::BIGINT AS sx2,
             SUM(y)::BIGINT  AS sy,
             SUM(x1 * x1)::BIGINT AS s11, SUM(x1 * x2)::BIGINT AS s12,
             SUM(x2 * x2)::BIGINT AS s22,
             SUM(x1 * y)::BIGINT AS s1y, SUM(x2 * y)::BIGINT AS s2y,
             SUM(y * y)::BIGINT AS syy
      FROM t GROUP BY 1),
    c AS (
      SELECT {key}, n,
             n::DOUBLE AS nd,
             sx1::DOUBLE AS dx1, sx2::DOUBLE AS dx2, sy::DOUBLE AS dy,
             n::DOUBLE * s11::DOUBLE - sx1::DOUBLE * sx1::DOUBLE AS s11c,
             n::DOUBLE * s12::DOUBLE - sx1::DOUBLE * sx2::DOUBLE AS s12c,
             n::DOUBLE * s22::DOUBLE - sx2::DOUBLE * sx2::DOUBLE AS s22c,
             n::DOUBLE * s1y::DOUBLE - sx1::DOUBLE * sy::DOUBLE AS s1yc,
             n::DOUBLE * s2y::DOUBLE - sx2::DOUBLE * sy::DOUBLE AS s2yc,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS sst
      FROM m),
    b AS (
      SELECT {key}, n, nd, dx1, dx2, dy, s1yc, s2yc, sst,
             (s1yc * s22c - s2yc * s12c)
               / (s11c * s22c - s12c * s12c) AS b1,
             (s2yc * s11c - s1yc * s12c)
               / (s11c * s22c - s12c * s12c) AS b2
      FROM c)
    SELECT {key}, n,
           {b0} AS b0, {b1} AS b1, {b2} AS b2, {r2} AS r2
    FROM b
    """
