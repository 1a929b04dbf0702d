"""Entity co-occurrence lift: hand-computed semantics on a tiny mention
frame (sf parity lives in test_oracle_parity.py via kg_entity_cooccur)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.operators.cooccur import entity_cooccurrence


@pytest.fixture(scope="module")
def frames(spark):
    # 4 docs; aspirin+warfarin co-occur in 2, aspirin+ibuprofen in 1 (below
    # min_pair); duplicate mentions inside doc 1 must not inflate counts
    mentions = spark.createDataFrame(
        [
            (1, "aspirin"), (1, "aspirin"), (1, "warfarin"),
            (2, "aspirin"), (2, "warfarin"),
            (3, "aspirin"), (3, "ibuprofen"),
            (4, "ibuprofen"),
        ],
        ["doc_id", "text"],
    )
    n_docs = spark.range(4).agg(F.count(F.lit(1)).alias("n_docs"))
    return mentions, n_docs


def test_lift_exact(spark, frames):
    mentions, n_docs = frames
    rows = entity_cooccurrence(mentions, n_docs).collect()
    assert len(rows) == 1  # only aspirin+warfarin reaches min_pair=2
    r = rows[0]
    assert (r["ent_a"], r["ent_b"]) == ("aspirin", "warfarin")
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 2)
    # lift = n_ab*N / (n_a*n_b) = 2*4 / (3*2) = 4/3, snapped to 1e-6
    assert r["lift"] == pytest.approx(1.333333)
    assert r["rnk"] == 1


def test_pair_order_canonical(spark, frames):
    mentions, n_docs = frames
    out = entity_cooccurrence(mentions, n_docs, min_pair=1).collect()
    assert all(r["ent_a"] < r["ent_b"] for r in out)
    # aspirin+ibuprofen now appears, with doc-3-only support
    got = {(r["ent_a"], r["ent_b"]): r["n_ab"] for r in out}
    assert got[("aspirin", "ibuprofen")] == 1


def test_related_docs_hand_case(spark):
    from ehr_ner_spark.operators.cooccur import related_docs

    m = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"),
         (2, "x"), (2, "y"),
         (3, "x"), (3, "q")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in related_docs(m, df_cap=64, min_shared=2).collect()}
    # docs 1,2 share {x, y}; 1,3 and 2,3 share only {x}
    assert out == {(1, 2): 2}


def test_related_docs_hub_cap_excludes_corpus_stopword_entity(spark):
    from ehr_ner_spark.operators.cooccur import related_docs

    rows = [(d, "hub") for d in range(10)] + [(1, "a"), (2, "a")]
    m = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in related_docs(m, df_cap=5, min_shared=1).collect()}
    # 'hub' (df 10 > cap 5) generates NO pairs; only 'a' pairs 1-2
    assert out == {(1, 2): 1}
