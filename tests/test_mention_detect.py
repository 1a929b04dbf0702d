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
