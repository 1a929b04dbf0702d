"""SL (flat sequence-labeling) path: parity vs an independent sequential
oracle, flatness (no overlapping spans), and the SL-vs-QASL comparison."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from ehr_ner_spark.corpus import corpus
from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.kernel.sl import DeterministicSLScorer, sl_predict
from ehr_ner_spark.kernel.wordpiece import CLS, SEP, tokenize_text, wp_split
from ehr_ner_spark.operators.sl_detect import detect_mentions_sl
from ehr_ner_spark.queries_battery import QUERIES
from tests.reference_impl import oracle_decode

TYPES = list(QUERIES.keys())


def _oracle_sl(passage: str, pid: int, max_seq: int = 512):
    """Independent sequential SL twin (loop-structured, reference-style)."""
    qa = DeterministicQAScorer()
    toks = tokenize_text(passage)
    p_sub = [p for t in toks for p in wp_split(t)][: max_seq - 2]
    seq = [CLS] + p_sub + [SEP]
    per_type = {t: qa.logits(t, seq) for t in TYPES}  # (n, 3) each
    labels = []
    for i, tok in enumerate(seq):
        best_lab, best_score = "O", qa.O_BIAS
        for t in TYPES:
            lg = per_type[t]
            for k, prefix in ((0, "B-"), (1, "I-")):
                if lg[i, k] > best_score:
                    best_lab, best_score = prefix + t, lg[i, k]
        labels.append(best_lab)
    m_toks, m_labs = [], []
    for t, lab in zip(seq, labels):
        if "##" in t:
            m_toks[-1] = m_toks[-1] + t[2:]
        else:
            m_toks.append(t)
            m_labs.append(lab)
    return oracle_decode(m_toks[1:-1], m_labs[1:-1], pid=pid)


def test_sl_kernel_matches_oracle():
    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 15"
    ).fetchall()
    scorer = DeterministicSLScorer(TYPES)
    for did, text in rows:
        fast = sl_predict(scorer, tokenize_text(text), pid=did)
        slow = _oracle_sl(text, pid=did)
        assert fast == slow, did


def test_sl_is_flat(spark, sf_dir):
    """SL spans never overlap within a document (argmax over one label
    space), unlike the QASL overlay."""
    out = detect_mentions_sl(corpus(spark, sf_dir).limit(60), num_partitions=4).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.start_pos, r.end_pos))
    for doc, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, (doc, (s1, e1), (s2, e2))


def test_sl_vs_qasl_metrics(spark, sf_dir):
    import __spark_entry__ as se

    row = se.queries()["kg_sl_vs_qasl"](spark, sf_dir).collect()[0]
    # SL is the flat projection of a nested task: recall vs QASL < 1
    assert 0 < row.recall < 1
    assert row.nb_pred > 0 and row.nb_true > row.nb_pred
