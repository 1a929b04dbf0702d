"""Property-based Spark-vs-DuckDB equivalence for the round-3 pipeline ops
(stratified sampling, sequence packing, decontamination) over adversarial
generated documents — sparse/huge doc_ids (bucket boundaries), empty and
single-token texts, duplicate contents, unseen strata."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ehr_ner_spark.operators.dedup import decontaminate, decontaminate_sql
from ehr_ner_spark.operators.sampling import (
    pack_sequences,
    pack_sequences_sql,
    stratified_sample,
    stratified_sample_sql,
)

_WORD = st.sampled_from(
    ["alpha", "beta", "x9", "漢字", "...", "q" * 30, "a b", ""]
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)
_LANG = st.sampled_from(["en", "de", "xx"])  # 'xx' hits the default rate
_IDS = st.sets(
    st.one_of(
        st.integers(min_value=0, max_value=40),       # dense low ids
        st.integers(min_value=90, max_value=110),      # % 97 boundary
        st.integers(min_value=10**9, max_value=10**9 + 50),  # bucket stress
    ),
    min_size=1,
    max_size=10,
)

_RATES = {"en": 500000, "de": 150000}


@st.composite
def _doc_rows(draw):
    ids = sorted(draw(_IDS))
    return [
        (i, draw(_TEXT), draw(_LANG), "s", 0) for i in ids
    ]


def _setup(spark, rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    return con, df


@pytest.mark.parametrize("bucket_width", [4, 1024])
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_pack_sequences_fuzz(spark, bucket_width, rows):
    con, df = _setup(spark, rows)
    got = sorted(
        map(tuple, pack_sequences(df, chunk=7, bucket_width=bucket_width).collect())
    )
    exp = sorted(map(tuple, con.execute(pack_sequences_sql(chunk=7)).fetchall()))
    assert got == exp


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_stratified_sample_fuzz(spark, rows):
    con, df = _setup(spark, rows)
    got = sorted(
        map(tuple, stratified_sample(df, _RATES, default_ppm=300000).collect())
    )
    exp = sorted(
        map(
            tuple,
            con.execute(
                stratified_sample_sql(_RATES, default_ppm=300000)
            ).fetchall(),
        )
    )
    assert got == exp


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_decontaminate_fuzz(spark, rows):
    con, df = _setup(spark, rows)
    got = sorted(map(tuple, decontaminate(df, n=3, min_hits=1).collect()))
    exp = sorted(
        map(tuple, con.execute(decontaminate_sql(n=3, min_hits=1)).fetchall())
    )
    assert got == exp


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_doc_rows())
def test_weighted_reservoir_fuzz(spark, rows):
    """Two-phase salted top-k == the oracle's single window per stratum,
    over adversarial ids/texts (empty texts -> weight 1, huge ids, CJK)."""
    from ehr_ner_spark.operators.sampling import (
        weighted_reservoir,
        weighted_reservoir_sql,
    )

    con, df = _setup(spark, rows)
    got = sorted(map(tuple, weighted_reservoir(df, k=3).collect()))
    exp = sorted(
        map(tuple, con.execute(weighted_reservoir_sql(k=3)).fetchall())
    )
    assert got == exp
