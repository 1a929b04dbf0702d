"""Re-identification audit: k-anonymity + l-diversity over quasi-identifier
equivalence classes — the privacy screen a training-data pipeline runs
before releasing or joining customer-adjacent records.

Semantics (Sweeney k-anonymity, Machanavajjhala l-diversity): group rows by
the quasi-identifier tuple (nation, market segment, account-balance
bucket); a class is k-anonymous when at least ``k`` rows share the tuple,
and l-diverse when its rows cover at least ``l`` distinct values of the
sensitive attribute (here: the order priorities of the class's customers —
a cross-table sensitive attribute, the realistic case).

Scale shape: the class aggregate is ONE map-side-combined groupBy over the
customer scan; the sensitive side pre-deduplicates orders to
(custkey, priority) BEFORE any join (orders is the big table — the dedup
is map-side combinable and collapses it to <= n_customers x n_priorities
rows), joins customer's QI columns on custkey, dedups to
(class, priority), and counts — every frame after the first dedup is
bounded by |QI classes| x n_priorities, and the final class <- sensitive
join is broadcast-sized by construction (|classes| <= nations x segments x
buckets).

Determinism discipline: the balance bucket is FLOOR over an IEEE division
of half-away cents (identical double ops both engines — no integer-DIV
sign-semantics hazard on negative balances); everything else is integer
counts and boolean comparisons.

Reference contact: none (privacy family, alongside the PII scrub in
operators/textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_ANON = 5
L_DIVERSE = 2
BAL_BUCKET_CENTS = 100_000  # $1,000 buckets


def k_anonymity(
    customer: DataFrame,
    orders: DataFrame,
    k: int = K_ANON,
    l_div: int = L_DIVERSE,
) -> DataFrame:
    """Per quasi-identifier class: size, sensitive-value diversity, and the
    k-anonymous / l-diverse flags.  Output: (c_nationkey, c_mktsegment,
    bal_bucket, class_size, n_priorities, k_anonymous, l_diverse)."""
    qi = customer.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            F.floor(F.col("c_acctbal") * 100 + 0.5) / BAL_BUCKET_CENTS
        ).cast("long").alias("bal_bucket"),
    )
    classes = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    # sensitive attribute: the class's customers' order priorities —
    # dedup orders FIRST so the join never carries order-level volume
    sens = (
        orders.select("o_custkey", "o_orderpriority").distinct()
        .join(qi, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_nationkey", "c_mktsegment", "bal_bucket", "o_orderpriority")
        .distinct()
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("n_priorities"))
    )
    return (
        classes.join(
            F.broadcast(sens),
            ["c_nationkey", "c_mktsegment", "bal_bucket"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "class_size",
            F.coalesce(F.col("n_priorities"), F.lit(0))
            .cast("long").alias("n_priorities"),
            (F.col("class_size") >= k).alias("k_anonymous"),
            (F.coalesce(F.col("n_priorities"), F.lit(0)) >= l_div)
            .alias("l_diverse"),
        )
    )


def k_anonymity_sql(
    k: int = K_ANON,
    l_div: int = L_DIVERSE,
    customer: str = "customer",
    orders: str = "orders",
) -> str:
    """DuckDB twin — identical bucketing, counts and flags."""
    return f"""
    WITH qi AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(FLOOR(c_acctbal * 100 + 0.5)
                        / {BAL_BUCKET_CENTS}) AS BIGINT) AS bal_bucket
      FROM {customer}),
    classes AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             COUNT(*)::BIGINT AS class_size
      FROM qi GROUP BY 1, 2, 3),
    op AS (SELECT DISTINCT o_custkey, o_orderpriority FROM {orders}),
    sens AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             COUNT(*)::BIGINT AS n_priorities
      FROM (SELECT DISTINCT c_nationkey, c_mktsegment, bal_bucket,
                            o_orderpriority
            FROM op JOIN qi ON o_custkey = c_custkey)
      GROUP BY 1, 2, 3)
    SELECT c.c_nationkey, c.c_mktsegment, c.bal_bucket, c.class_size,
           COALESCE(s.n_priorities, 0)::BIGINT AS n_priorities,
           c.class_size >= {k} AS k_anonymous,
           COALESCE(s.n_priorities, 0) >= {l_div} AS l_diverse
    FROM classes c
    LEFT JOIN sens s USING (c_nationkey, c_mktsegment, bal_bucket)
    """
