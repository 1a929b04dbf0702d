"""Property-based Spark-vs-DuckDB equivalence for the session-16/17 ops
(chi-square keywords, k-anonymity, fold drift) over adversarial generated
rows — tiny classes straddling k, degenerate margins (a term in every
doc), negative balances on the bucket boundary, fold-unbalanced corpora."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ehr_ner_spark.operators.chisq import chi2_keywords, chi2_keywords_sql
from ehr_ner_spark.operators.dataquality import (
    distribution_drift,
    distribution_drift_sql,
)
from ehr_ner_spark.operators.privacy import k_anonymity, k_anonymity_sql

_WORD = st.sampled_from(["alpha", "beta", "gamma", "zz", "qq"])
_TEXT = st.lists(_WORD, min_size=0, max_size=6).map(" ".join)
_LANG = st.sampled_from(["en", "de"])


@st.composite
def _doc_rows(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    return [
        (
            i,
            draw(_TEXT),
            draw(_LANG),
            "s",
            draw(st.integers(min_value=0, max_value=700)),
        )
        for i in range(n)
    ]


def _docs(spark, rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        "  source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return con, df


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_chi2_keywords_fuzz(spark, rows):
    """df floor, degenerate-margin exclusion, rank tie-breaks and the
    shared double expression tree agree bit-for-bit across engines."""
    con, df = _docs(spark, rows)
    got = sorted(map(tuple, chi2_keywords(df, k=4, df_min=1).collect()))
    exp = sorted(
        map(tuple, con.execute(chi2_keywords_sql(k=4, df_min=1)).fetchall())
    )
    assert got == exp


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_distribution_drift_fuzz(spark, rows):
    """Folds, bucket floors, bp truncation and the TVD agree exactly —
    including corpora where one fold is empty (an empty fold has zero
    mass by definition on both engines; no ANSI division-by-zero)."""
    con, df = _docs(spark, rows)
    got = sorted(map(tuple, distribution_drift(df).collect()))
    exp = sorted(map(tuple, con.execute(distribution_drift_sql()).fetchall()))
    assert got == exp


_BAL = st.one_of(
    st.integers(min_value=-1100, max_value=1100).map(lambda c: c / 100.0),
    st.sampled_from([-1000.0, -0.01, 0.0, 999.99, 1000.0, 2000.005]),
)


@st.composite
def _cust_orders(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    cust = [
        (
            i,
            f"c{i}",
            draw(st.integers(min_value=0, max_value=2)),
            draw(_BAL),
            draw(st.sampled_from(["AUTO", "STEEL"])),
        )
        for i in range(n)
    ]
    orders = [
        (
            j,
            draw(st.integers(min_value=0, max_value=n)),  # n = missing cust
            draw(st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"])),
        )
        for j in range(draw(st.integers(min_value=0, max_value=10)))
    ]
    return cust, orders


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(co=_cust_orders())
def test_k_anonymity_fuzz(spark, co):
    """Class sizes, buckets on negative/boundary balances, diversity with
    orphan orders and order-less customers agree across engines."""
    cust_rows, order_rows = co
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR,"
        " c_nationkey BIGINT, c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.executemany(
        "INSERT INTO customer VALUES (?, ?, ?, ?, ?)", cust_rows
    )
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderpriority VARCHAR)"
    )
    if order_rows:
        con.executemany("INSERT INTO orders VALUES (?, ?, ?)", order_rows)
    cdf = spark.createDataFrame(
        cust_rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    odf = spark.createDataFrame(
        order_rows or [(0, -1, "x")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    if not order_rows:
        odf = odf.filter("o_orderkey < 0")
    got = sorted(map(tuple, k_anonymity(cdf, odf, k=3, l_div=2).collect()))
    exp = sorted(
        map(tuple, con.execute(k_anonymity_sql(k=3, l_div=2)).fetchall())
    )
    assert got == exp
