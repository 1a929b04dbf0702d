"""Hypothesis fuzz for the U7 trainer: on adversarial document content
(unicode, long tokens, empty/whitespace docs) the distributed trainer must
stay bit-identical to the single-node NumPy reference — same accumulator,
same per-epoch mistakes.  Spark examples are expensive, so the strategy
draws few-but-nasty corpora (the oracle-parity test covers realistic text
at volume)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.kernel.train import (
    feat_b,
    feat_u,
    perceptron_train_local,
    teacher_rows,
)
from ehr_ner_spark.kernel.wordpiece import tokenize_text
from ehr_ner_spark.operators.train import (
    TRAIN_TAGS,
    fit_tagger,
    tags_qlen,
    training_frame,
)

doc_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    min_size=0,
    max_size=400,
)


def _local(docs):
    scorer = DeterministicQAScorer()
    tq = tags_qlen(TRAIN_TAGS)
    rows = []
    for content in docs:
        for tag, _pos, piece, prev, y in teacher_rows(
            scorer, tq, tokenize_text(content), max_seq_length=128
        ):
            rows.append((feat_u(tag, piece), feat_b(tag, prev, piece), y))
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_text, min_size=1, max_size=6))
def test_spark_trainer_matches_local_on_adversarial_docs(spark, docs):
    acc_l, mist_l = perceptron_train_local(_local(docs), epochs=2)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, content string"
    )
    tf = training_frame(df, num_partitions=2)
    acc_s, mist_s = fit_tagger(tf, epochs=2)
    assert mist_s == mist_l
    assert np.array_equal(acc_s, acc_l)
