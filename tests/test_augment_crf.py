"""Augmentation (J3 top-2 get-back) and CRF Viterbi (W4/W6) tests."""

from __future__ import annotations

import numpy as np
import pytest

from ehr_ner_spark.kernel.augment import augment_doc, get_back_from_top2
from ehr_ner_spark.kernel.crf import (
    CLASS_WEIGHTS,
    viterbi_decode,
    viterbi_decode_bruteforce,
)
from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.operators.augment import augment_corpus
from ehr_ner_spark.queries_battery import QUERIES


# ---------------------------------------------------------------- CRF / W4
def test_viterbi_matches_bruteforce():
    rng = np.random.RandomState(5)
    for n in (1, 2, 3, 5, 7):
        for _ in range(20):
            em = rng.uniform(-2, 2, size=(n, 3))
            assert viterbi_decode(em) == viterbi_decode_bruteforce(em), (n, em)


def test_viterbi_class_weights_matter():
    # unweighted: B (7.0) clears O (5.0) by 2.0/token — more than the
    # O-sticky transition structure can claw back; weighted: B*0.11 = 0.77
    # falls below O*0.16 = 0.80, so the decode flips to all-O
    em = np.array([[7.0, 0.1, 5.0]] * 4)
    with_w = viterbi_decode(em, class_weights=CLASS_WEIGHTS)
    without = viterbi_decode(em, class_weights=None)
    assert without == [0, 0, 0, 0]      # unweighted: B dominates everywhere
    assert with_w != without            # W6 weighting changes the decode


def test_viterbi_mask():
    em = np.random.RandomState(0).uniform(-1, 1, size=(6, 3))
    full = viterbi_decode(em[:4])
    masked = viterbi_decode(em, mask=[True] * 4 + [False] * 2)
    assert full == masked


# ------------------------------------------------------------ get-back / J3
def _top2(labels_probs):
    return [list(labels_probs)]


def test_get_back_admits_well_shaped_span():
    top1 = [(0, "EMD", 1, 2, "xy")]  # date-typed (ends with D)
    # query 0's top-2 sequence: B at 1, I at 2, high probs there
    seq = [("O", 0.1), ("B-SGN", 0.9), ("I-SGN", 0.9), ("O", 0.1)]
    out = get_back_from_top2(top1, _top2(seq), {0: "SGN"}, p_times=1.3)
    assert len(out) == 1
    ratio, typ, s, e, text = out[0]
    assert (typ, s, e, text) == ("SGN", 1, 2, "xy")
    assert ratio > 1.3


def test_get_back_rejects_low_prob_and_bad_shape():
    top1 = [(0, "EMD", 1, 2, "xy")]
    low = [("O", 0.5), ("B-SGN", 0.55), ("I-SGN", 0.55), ("O", 0.5)]
    assert get_back_from_top2(top1, _top2(low), {0: "SGN"}, 1.3) == []
    bad_shape = [("O", 0.1), ("B-SGN", 0.9), ("B-SGN", 0.9), ("O", 0.1)]
    assert get_back_from_top2(top1, _top2(bad_shape), {0: "SGN"}, 1.3) == []


def test_get_back_single_token_nan_quirk():
    """Faithful reference quirk: single-token spans never get back
    (empty interior -> NaN mean -> gate False)."""
    top1 = [(0, "EMD", 1, 1, "x")]
    seq = [("O", 0.1), ("B-SGN", 0.99), ("O", 0.1)]
    assert get_back_from_top2(top1, _top2(seq), {0: "SGN"}, 0.1) == []


def test_get_back_non_date_types_ignored():
    top1 = [(0, "SGN", 1, 2, "xy")]  # SGN doesn't end with D/S/E
    seq = [("O", 0.1), ("B-ADD", 0.9), ("I-ADD", 0.9), ("O", 0.1)]
    assert get_back_from_top2(top1, _top2(seq), {0: "ADD"}, 1.3) == []


# ------------------------------------------------------- Spark operator
def test_augment_corpus_spark_matches_kernel(spark, sf_dir):
    from ehr_ner_spark.corpus import corpus

    c = corpus(spark, sf_dir).limit(20)
    out = augment_corpus(c, p_times=1.1, num_partitions=4).collect()
    spark_spans = {
        (r.doc_id, r.type, r.start_pos, r.end_pos, r.text, r.origin)
        for r in out
    }
    scorer = DeterministicQAScorer()
    expected = set()
    for row in c.select("doc_id", "content").collect():
        top1, top2 = augment_doc(scorer, QUERIES, row.content, row.doc_id, 1.1)
        seen = set()
        for (_p, typ, s, e, txt) in top1:
            seen.add((row.doc_id, typ, s, e, txt))
            expected.add((row.doc_id, typ, s, e, txt, "top1"))
        for (_r, typ, s, e, txt) in top2:
            if (row.doc_id, typ, s, e, txt) not in seen:
                expected.add((row.doc_id, typ, s, e, txt, "top2"))
    assert spark_spans == expected
    assert any(o == "top2" for *_x, o in spark_spans)  # get-back fired


def test_log_partition_matches_enumeration():
    """crf_log_partition == logsumexp over ALL path scores (tiny n)."""
    from ehr_ner_spark.kernel.crf import (
        N_TAGS,
        crf_log_partition,
        crf_sequence_score,
    )
    import itertools

    rng = np.random.RandomState(7)
    for n in (1, 2, 3, 4):
        em = rng.uniform(-2, 2, size=(n, 3))
        scores = [
            crf_sequence_score(em, seq)
            for seq in itertools.product(range(N_TAGS), repeat=n)
        ]
        m = max(scores)
        expected = m + np.log(sum(np.exp(s - m) for s in scores))
        assert abs(crf_log_partition(em) - expected) < 1e-9


def test_confidence_is_log_probability():
    """score(viterbi path) - logZ is a log-probability: <= 0, and the
    Viterbi path maximizes it over sampled alternative paths."""
    from ehr_ner_spark.kernel.crf import (
        crf_log_partition,
        crf_sequence_score,
        viterbi_decode,
    )

    rng = np.random.RandomState(13)
    em = rng.uniform(-2, 2, size=(6, 3))
    path = viterbi_decode(em, class_weights=None)
    conf = crf_sequence_score(em, path) - crf_log_partition(em)
    assert conf <= 1e-12
    for _ in range(50):
        alt = list(rng.randint(0, 3, size=6))
        assert crf_sequence_score(em, alt) <= crf_sequence_score(em, path) + 1e-12
