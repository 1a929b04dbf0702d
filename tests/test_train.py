"""U7 training loop: distributed == single-node exactly, convergence, and
the trained model redeployed through the Scorer plug point."""

from __future__ import annotations

import numpy as np
import pytest

from ehr_ner_spark.corpus import corpus
from ehr_ner_spark.kernel.scorer import (
    DeterministicQAScorer,
    verify_scorer_contract,
)
from ehr_ner_spark.kernel.train import (
    TRAIN_DIM,
    TrainedPerceptronScorer,
    combine_weights,
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

N_DOCS = 40  # enough for thousands of training tokens, small enough for CI


def _local_rows(docs):
    scorer = DeterministicQAScorer()
    tq = tags_qlen(TRAIN_TAGS)
    rows = []
    for content in docs:
        for tag, _pos, piece, prev, y in teacher_rows(
            scorer, tq, tokenize_text(content), max_seq_length=128
        ):
            rows.append((feat_u(tag, piece), feat_b(tag, prev, piece), y))
    return rows


@pytest.fixture(scope="module")
def small_corpus(spark, sf_dir):
    c = corpus(spark, sf_dir).limit(N_DOCS)
    docs = [r.content for r in c.select("content").collect()]
    return c, docs


def test_spark_trainer_equals_local_exactly(spark, small_corpus):
    """The whole point of the count-based formulation: the distributed
    trainer is bit-identical to the NumPy reference — accumulator, weights,
    and every epoch's mistake count."""
    c, docs = small_corpus
    acc_l, mist_l = perceptron_train_local(_local_rows(docs), epochs=3)
    tf = training_frame(c, num_partitions=4)
    acc_s, mist_s = fit_tagger(tf, epochs=3)
    assert mist_s == mist_l
    assert np.array_equal(acc_s, acc_l)
    assert np.array_equal(combine_weights(acc_s), combine_weights(acc_l))


def test_training_converges(small_corpus):
    """Distillation of a realizable concept: the teacher's label is a pure
    function of (tag, piece, prev), so the mistake curve must collapse from
    the all-wrong epoch 1 to a small residual (hash-bucket collisions)."""
    _c, docs = small_corpus
    rows = _local_rows(docs)
    _acc, mistakes = perceptron_train_local(rows, epochs=3)
    total = len(rows)
    assert mistakes[0] == total  # W=0 predicts B everywhere; teacher ~never
    final = mistakes[-1]
    assert final < 0.1 * total, (final, total)
    assert final < 0.2 * mistakes[0]


def test_trained_scorer_contract_and_detect(spark, small_corpus):
    """The learned weights drive the full detection pipeline through the
    Scorer plug point: contract passes, spans come out, and the student
    agrees with the teacher on the vast majority of piece labels."""
    from ehr_ner_spark.operators.mention_detect import detect_mentions
    from ehr_ner_spark.queries_battery import QUERIES

    c, docs = small_corpus
    acc, _ = perceptron_train_local(_local_rows(docs), epochs=3)
    w = combine_weights(acc)

    def factory(w=w):
        return TrainedPerceptronScorer(w)

    verify_scorer_contract(
        factory(),
        list(TRAIN_TAGS),
        "patient took aspirin 100 mg twice daily for pain".split(),
        fresh_factory=factory,
    )

    # student-vs-teacher label agreement on held-out-ish text (same corpus,
    # agreement includes hash-collision noise)
    teacher = DeterministicQAScorer()
    student = factory()
    agree = tot = 0
    for content in docs[:10]:
        from ehr_ner_spark.kernel.wordpiece import SEP, wp_split_seq

        pieces = wp_split_seq(tokenize_text(content))[:100]
        scored = [SEP] + pieces
        for tag in TRAIN_TAGS:
            t_lab = teacher.top1_tags_battery([tag], scored)[0, 1:]
            s_lab = student.top1_tags_battery([tag], scored)[0, 1:]
            agree += int((t_lab == s_lab).sum())
            tot += len(pieces)
    assert tot and agree / tot > 0.9, (agree, tot)

    # and the trained scorer drives detect_mentions unchanged
    queries = {t: QUERIES[t] for t in TRAIN_TAGS}
    spans = detect_mentions(
        c, queries=queries, num_partitions=2, scorer_factory=factory
    ).collect()
    docs_map = {r.doc_id: r.content for r in c.select("doc_id", "content").collect()}
    for r in spans[:100]:
        toks = tokenize_text(docs_map[r.doc_id])
        assert "".join(toks[r.start_pos : r.end_pos + 1]) == r.text


def test_train_metrics_shape(spark, small_corpus):
    from ehr_ner_spark.operators.train import train_metrics

    c, _docs = small_corpus
    out = train_metrics(c, epochs=2, num_partitions=4).collect()
    assert [r.epoch for r in sorted(out, key=lambda r: r.epoch)] == [1, 2, 3]
    for r in out:
        assert r.correct == r.total - r.mistakes


def test_train_langid_pocket_curve(spark):
    """The pocket curve is monotone non-increasing, epoch 1 is the
    zero-model baseline (argmax = lexicographically-first language), and
    epoch 2 improves on it (the model learns)."""
    from ehr_ner_spark.operators.langtrain import train_langid

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(train_langid(docs).collect(), key=lambda r: r.epoch)
    assert [r.epoch for r in rows] == [1, 2, 3]
    n_docs = rows[0].n_docs
    first_lang = min(r.lang for r in docs.select("lang").distinct().collect())
    n_first = docs.where(f"lang = '{first_lang}'").count()
    assert rows[0].n_mistakes == n_docs - n_first   # zero model
    assert rows[1].n_mistakes < rows[0].n_mistakes  # it learns
    pockets = [r.pocket_mistakes for r in rows]
    assert pockets == [min(r.n_mistakes for r in rows[: i + 1])
                       for i in range(len(rows))]
