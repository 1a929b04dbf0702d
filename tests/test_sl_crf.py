"""SL-CRF (65-label tied-transition CRF) kernel and operator tests."""

from __future__ import annotations

import numpy as np
import pytest

from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.kernel.sl_crf import (
    BASE,
    BONUS,
    _bwd,
    _fwd,
    sl_crf_decode_bruteforce,
    sl_crf_predict,
)
from ehr_ner_spark.kernel.wordpiece import tokenize_text
from ehr_ner_spark.queries_battery import QUERIES


def test_tying_invariant():
    """bonus >= 0 everywhere — the 5-term max collapse is exact only if
    same-type transitions are never worse than cross-type ones."""
    assert (BONUS >= 0).all()


@pytest.mark.parametrize("seed", range(8))
def test_posterior_decode_matches_enumeration(seed):
    """fwd+bwd posterior-mode labels == exhaustive best-path enumeration
    over the full tied-transition label space (tiny n, T)."""
    rng = np.random.RandomState(seed)
    n, t = rng.randint(2, 5), rng.randint(1, 4)
    eb = rng.uniform(-2, 2, (n, t))
    ei = rng.uniform(-2, 2, (n, t))
    eo = rng.uniform(-2, 2, n)
    vb, vi, vo = _fwd(eb, ei, eo)
    wb, wi, wo = _bwd(eb, ei, eo)
    post = np.empty((n, 1 + 2 * t))
    post[:, 0] = vo + wo
    post[:, 1::2] = vb + wb
    post[:, 2::2] = vi + wi
    assert post.argmax(axis=1).tolist() == sl_crf_decode_bruteforce(eb, ei, eo)


def test_sl_crf_differs_from_sl_argmax():
    """The CRF layer changes predictions somewhere (transitions matter)."""
    from ehr_ner_spark.kernel.sl import DeterministicSLScorer, sl_predict

    types = list(QUERIES.keys())
    qa = DeterministicQAScorer()
    sl = DeterministicSLScorer(types)
    import random

    rng = random.Random(3)
    vocab = ["病", "人", "2019", "x", "alpha", ",", "天"]
    diff = 0
    for i in range(15):
        passage = "".join(
            rng.choice(vocab) + (" " if rng.random() < 0.3 else "")
            for _ in range(120)
        )
        toks = tokenize_text(passage)
        a = sorted(sl_predict(sl, toks, pid=i))
        b = sorted(sl_crf_predict(qa, types, toks, pid=i))
        diff += a != b
    assert diff > 0


def test_detect_mentions_sl_crf_spark(spark, sf_dir):
    """Spark operator parity against the single-node kernel."""
    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.operators.sl_detect import detect_mentions_sl_crf

    types = list(QUERIES.keys())
    c = corpus(spark, sf_dir).limit(20)
    got = [
        (r.doc_id, r.type, r.start_pos, r.end_pos, r.text)
        for r in detect_mentions_sl_crf(c, num_partitions=4).collect()
    ]
    qa = DeterministicQAScorer()
    expected = []
    for r in c.select("doc_id", "content").collect():
        expected.extend(
            sl_crf_predict(qa, types, tokenize_text(r.content), pid=int(r.doc_id))
        )
    assert sorted(got) == sorted(expected)
    # flat model: no overlapping spans within a document
    by_doc: dict = {}
    for (d, _t, s, e, _x) in got:
        by_doc.setdefault(d, []).append((s, e))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 < s2
