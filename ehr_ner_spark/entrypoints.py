"""Query registry: every implemented operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable, with a DuckDB-equivalent oracle SQL
string where the semantics are SQL-expressible (the driver's correctness
gate).  Non-SQL-expressible kernels (hash-scorer mention detection, MinHash
signatures) get rows-only checks here and exact parity tests in tests/.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values).  Float aggregates are rounded on both sides so engine-order
summation noise cannot flip the value hash.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import CORPUS_SQL, corpus
from .operators.mention_detect import detect_mentions, mentions_as_triples

QUERIES_REGISTRY: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_REGISTRY: Dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES_REGISTRY[name] = fn
        if oracle is not None:
            ORACLE_REGISTRY[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus -> battery mention detection -> raw triples (driver smoke)."""
    m = detect_mentions(corpus(spark, sf_dir), num_partitions=8)
    return mentions_as_triples(m)


# ---------------------------------------------------------------------------
# KG pipeline queries
# ---------------------------------------------------------------------------

@_register(
    "kg_corpus_sha",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL})
    SELECT doc_id, repo, path, commit, lang, content_sha
    FROM corpus
    """,
)
def kg_corpus_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 scan + per-row sha256(content) invariant (BASELINE input_hint)."""
    return corpus(spark, sf_dir).select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha"
    )


@_register("kg_mentions")  # scorer kernel: rows-only check; parity in pytest
def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship W1+U6: battery mention detection (exploded span rows)."""
    return detect_mentions(corpus(spark, sf_dir), num_partitions=8).select(
        "doc_id", "type", "start_pos", "end_pos", "text"
    )


@_register("kg_triples")  # rows-only (depends on scorer kernel)
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship(spark, sf_dir).select("subj", "pred", "obj")


# ---------------------------------------------------------------------------
# Relational core (classic operators the reference lacks; Spark built-ins)
# ---------------------------------------------------------------------------

@_register(
    "rel_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                              AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                              AS avg_qty,
           ROUND(AVG(l_discount), 4)                              AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6-style grouped aggregation (TPC-H Q1 shape): partial+final agg,
    predicate pushdown to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "rel_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*)                      AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 50
    """,
)
def rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-style equi-joins + agg + global top-k; nation is broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.where(F.col("o_orderstatus") != "F")
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(50)
    )


@_register(
    "rel_order_rank_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
)
def rel_order_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-shaped window computation: per-key ranking, top-3 per customer."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") <= 3)
    )


@_register(
    "rel_events_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts)       AS window_start,
           event_type,
           COUNT(*)                     AS n_events,
           ROUND(SUM(value), 2)         AS sum_value,
           COUNT(DISTINCT user_id)      AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def rel_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table (batch view of
    the Structured-Streaming plan in streaming/)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
