"""End-to-end parity gate: the distributed mention-detection DAG must emit
EXACTLY the span set the single-node oracle emits (P = R = 1.0 ≥ 0.95, the
BASELINE.json north-rule gate), and must preserve the per-row content sha256
invariant.
"""

from __future__ import annotations

import duckdb
import pytest

from ehr_ner_spark.corpus import corpus
from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.operators.mention_detect import detect_mentions
from ehr_ner_spark.queries_battery import QUERIES
from tests.reference_impl import oracle_predict_overall


@pytest.fixture(scope="module")
def mention_rows(spark, sf_dir):
    c = corpus(spark, sf_dir)
    m = detect_mentions(c, num_partitions=8)
    return m.collect()


def _oracle_spans(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    scorer = DeterministicQAScorer()
    spans = set()
    for doc_id, text in rows:
        for (pid, typ, s, e, txt) in oracle_predict_overall(scorer, QUERIES, text, pid=doc_id):
            spans.add((pid, typ, s, e, txt))
    return spans


def test_spark_matches_oracle_exactly(mention_rows, sf_dir):
    spark_spans = {
        (r.doc_id, r.type, r.start_pos, r.end_pos, r.text) for r in mention_rows
    }
    oracle = _oracle_spans(sf_dir)
    nb_correct = len(spark_spans & oracle)
    precision = nb_correct / len(spark_spans)
    recall = nb_correct / len(oracle)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} spark={len(spark_spans)} oracle={len(oracle)}"
    )
    assert len(oracle) > 0


def test_span_text_invariant(spark, sf_dir, mention_rows):
    """J5: every span's text equals the ""-join of its passage tokens slice
    (feaproducer.py:138,159 assert, as a DataFrame check)."""
    from ehr_ner_spark.kernel.wordpiece import tokenize_text

    docs = {
        r.doc_id: tokenize_text(r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in mention_rows:
        toks = docs[r.doc_id]
        assert r.text == "".join(toks[r.start_pos : r.end_pos + 1])


def test_content_sha_invariant(spark, sf_dir, mention_rows):
    """Per-row sha256(content) carried from source to mentions unchanged."""
    src = {
        (r.doc_id, r.content_sha)
        for r in corpus(spark, sf_dir).select("doc_id", "content_sha").collect()
    }
    seen = {(r.doc_id, r.content_sha) for r in mention_rows}
    assert seen <= src and len(seen) > 0


def test_nested_overlay_has_overlaps(mention_rows):
    """W8: overlapping spans of different types must coexist (nested NER)."""
    by_pos = {}
    for r in mention_rows:
        by_pos.setdefault((r.doc_id, r.start_pos, r.end_pos), set()).add(r.type)
    assert any(len(v) > 1 for v in by_pos.values())


@pytest.mark.parametrize("top_k", [1, 2, 3])
def test_predict_query_rows_topk(top_k):
    """The demo path (demo/app.py uses top_k=3): merged+stripped per-token
    rows carry k (label, prob) pairs; k=1/2/3 agree on their common prefix
    and the k=1 labels decode to exactly the predict_one_query spans."""
    import numpy as np

    from ehr_ner_spark.kernel.augment import predict_query_rows
    from ehr_ner_spark.kernel.iob2 import decode_bio
    from ehr_ner_spark.kernel.predict import predict_one_query
    from ehr_ner_spark.kernel.wordpiece import tokenize_text

    scorer = DeterministicQAScorer()
    tag, query = next(iter(QUERIES.items()))
    passage = (
        "patient took aspirin 100 mg twice daily since 2019-03-04 then "
        "switched to metformin 500 mg after hospitalization"
    )
    p_toks = tokenize_text(passage)
    q_toks = tokenize_text(query)

    rows = predict_query_rows(scorer, tag, q_toks, p_toks, top_k=top_k)
    # one merged row per passage token, 1 + 2k fields each
    assert len(rows) == len(p_toks)
    assert all(len(r) == 1 + 2 * top_k for r in rows)
    assert [r[0] for r in rows] == p_toks
    for r in rows:
        probs = [r[2 + 2 * k] for k in range(top_k)]
        labels = [r[1 + 2 * k] for k in range(top_k)]
        assert probs == sorted(probs, reverse=True)
        assert len(set(labels)) == top_k  # distinct label ids per rank
        if top_k == 3:
            assert np.isclose(sum(probs), 1.0)  # full label space
    # prefix property: rank columns are identical across k
    if top_k > 1:
        rows1 = predict_query_rows(scorer, tag, q_toks, p_toks, top_k=1)
        assert [(r[0], r[1], r[2]) for r in rows] == [tuple(r) for r in rows1]
    # decode parity: top-1 labels -> same spans as the span pipeline
    spans = decode_bio([r[0] for r in rows], [r[1] for r in rows], pid=7)
    assert spans == predict_one_query(scorer, tag, q_toks, p_toks, pid=7)
