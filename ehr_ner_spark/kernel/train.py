"""U7 — the training loop, re-expressed for Spark's execution model.

The reference fine-tunes BERT-QASL with a class-weighted cross-entropy
(/root/reference/train/run_ner.py:319-374, weights from simqasl_config.json)
over (query, passage) featurized token streams.  This sandbox has no torch,
so the trainable student here is the model family that IS implementable
exactly on both the engine and its ANSI-SQL oracle: a **hashed-feature
linear tagger** over the QASL label space ``{B, I, O}``, trained by the
class-weighted **batch structured perceptron** (Collins 2002 — the classic
NER trainer; equivalently, subgradient descent with lr=1 on the
class-weighted multiclass hinge loss at margin 0).

Why perceptron and not softmax-CE: every update is an INTEGER mistake count
scaled by the fixed class weights, so the distributed trainer and the
DuckDB oracle (operators/train_sql.py) agree *bit-for-bit* — no ``exp`` in
the loop, no float-summation-order discipline, no rounding tolerance.  The
weight at (feature f, label l) after any number of epochs is

    W[f, l] = cw_B * A[f, l, B] + cw_I * A[f, l, I] + cw_O * A[f, l, O]

with ``A`` an int64 mistake-count accumulator and ``cw`` the reference's
class weights ``[0.11, 1.0, 0.16]`` — a three-term IEEE-754 expression
evaluated in the same order on both sides.

Training signal (the fine-tuning surface): distillation of the resident
scorer — the student learns to reproduce the teacher's per-piece top-1
labels, exactly the label stream a real fine-tune would fit.  The teacher's
labels are a pure function of (query_tag, piece, previous piece), so the
unigram+bigram feature pair makes the concept class realizable and the
mistake curve must fall.

Features (hashing trick, dimension ``TRAIN_DIM`` buckets):

    f_u = md5_60(tag + '#u#' + piece)                % TRAIN_DIM
    f_b = md5_60(tag + '#b#' + prev + '#' + piece)   % TRAIN_DIM

— the engine computes them JVM-side (hashing.md5_60_expr, whole-stage
codegen) and the oracle with the shared ``MD5_60_SQL`` discipline.

This module is pure NumPy: it is the single-node reference implementation
the Spark trainer (operators/train.py) is held exactly equal to in
tests/test_train.py, and it hosts :class:`TrainedPerceptronScorer`, which
plugs the learned weights back into the Scorer contract so the trained
model drives ``detect_mentions`` unchanged (the train -> deploy loop).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from ..hashing import md5_60
from .scorer import CLASS_WEIGHTS, ScorerBase

TRAIN_DIM = 4096  # hashed-feature buckets (collisions intended & harmless)


def feat_u(tag: str, piece: str, dim: int = TRAIN_DIM) -> int:
    return md5_60(f"{tag}#u#{piece}") % dim


def feat_b(tag: str, prev: str, piece: str, dim: int = TRAIN_DIM) -> int:
    return md5_60(f"{tag}#b#{prev}#{piece}") % dim


def combine_weights(acc: np.ndarray) -> np.ndarray:
    """int64 mistake-count accumulator (dim, 3, 3) -> float64 W (dim, 3).

    Evaluation order is load-bearing: ``(cwB*A0 + cwI*A1) + cwO*A2`` is the
    exact expression the SQL oracle writes, so W is bit-identical."""
    return (
        CLASS_WEIGHTS[0] * acc[:, :, 0]
        + CLASS_WEIGHTS[1] * acc[:, :, 1]
        + CLASS_WEIGHTS[2] * acc[:, :, 2]
    )


def argmax_bio(lb: np.ndarray, li: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """First-occurrence (B < I < O) tie-break argmax — the same CASE the
    oracle writes: B wins ties against I and O; I wins ties against O."""
    out = np.full(lb.shape, 2, dtype=np.int64)
    is_i = li >= lo
    out[is_i] = 1
    is_b = (lb >= li) & (lb >= lo)
    out[is_b] = 0
    return out


def perceptron_epoch_local(
    rows: np.ndarray, acc: np.ndarray
) -> Tuple[np.ndarray, int]:
    """One full-batch epoch over ``rows`` (n, 3) int64 [f_u, f_b, y] given
    the current accumulator; returns (per-epoch delta counts, mistakes).

    Update rule per misclassified token (true y, predicted yhat != y), for
    each of its two features f:  A[f, y, y] += 1 ;  A[f, yhat, y] -= 1.
    """
    w = combine_weights(acc)
    fu, fb, y = rows[:, 0], rows[:, 1], rows[:, 2]
    lg = w[fu] + w[fb]  # (n, 3): unigram weight + bigram weight, that order
    yhat = argmax_bio(lg[:, 0], lg[:, 1], lg[:, 2])
    mis = yhat != y
    delta = np.zeros_like(acc)
    my, myh = y[mis], yhat[mis]
    for f in (fu[mis], fb[mis]):
        np.add.at(delta, (f, my, my), 1)
        np.add.at(delta, (f, myh, my), -1)
    return delta, int(mis.sum())


def perceptron_train_local(
    rows: Iterable[Tuple[int, int, int]],
    epochs: int = 3,
    dim: int = TRAIN_DIM,
) -> Tuple[np.ndarray, List[int]]:
    """Single-node reference trainer: returns the final accumulator and the
    mistake count per epoch PLUS a final evaluation pass (len epochs + 1).
    The Spark trainer (operators/train.py::fit_tagger) must match both
    exactly — asserted in tests/test_train.py."""
    mat = np.asarray(list(rows), dtype=np.int64).reshape(-1, 3)
    acc = np.zeros((dim, 3, 3), dtype=np.int64)
    mistakes: List[int] = []
    for _ in range(epochs):
        delta, m = perceptron_epoch_local(mat, acc)
        mistakes.append(m)
        acc += delta
    _, m_final = perceptron_epoch_local(mat, acc)  # eval only, no update
    mistakes.append(m_final)
    return acc, mistakes


class TrainedPerceptronScorer(ScorerBase):
    """The trained student deployed through the Scorer plug point: logits at
    position i are the learned ``W[f_u] + W[f_b]`` for (token i, token i-1)
    — context-local exactly as the contract requires, so
    ``verify_scorer_contract`` passes and ``detect_mentions`` runs the
    trained model with zero plan changes (the reference's train -> predict
    hand-off, run_ner.py -> bert_qasl_predictor.py)."""

    def __init__(self, weights: np.ndarray, dim: int = TRAIN_DIM) -> None:
        self.weights = np.asarray(weights, dtype=np.float64)
        self.dim = dim
        assert self.weights.shape == (dim, 3), self.weights.shape

    def logits(self, query_tag: str, tokens: Sequence[str]) -> np.ndarray:
        n = len(tokens)
        if n == 0:
            return np.zeros((0, 3), dtype=np.float64)
        w = self.weights
        out = np.empty((n, 3), dtype=np.float64)
        prev = ""
        for i, t in enumerate(tokens):
            out[i] = (
                w[feat_u(query_tag, t, self.dim)]
                + w[feat_b(query_tag, prev, t, self.dim)]
            )
            prev = t
        return out


def teacher_arrays(
    scorer,
    tags_qlen: Dict[str, int],
    passage_tokens: Sequence[str],
    max_seq_length: int = 128,
) -> List[Tuple[str, List[str], List[str], np.ndarray]]:
    """Per-document training examples as per-tag column arrays
    ``(tag, pieces, prevs, y)``: the teacher's top-1 label per passage
    wordpiece under the battery fast path's exact scoring convention
    (``[SEP] + pieces`` truncated to ``max_seq_length - qlen - 3``), with
    the same by-qlen grouping as kernel/predict.py ``predict_battery`` so
    the whole tag set costs ONE vectorized battery call per truncation
    group instead of one scorer call per tag."""
    from .wordpiece import SEP, wp_split

    p_sub: List[str] = []
    for t in passage_tokens:
        p_sub.extend(wp_split(t))
    by_len: Dict[int, List[str]] = {}
    max_qlen = 0
    for tag, qlen in tags_qlen.items():
        max_qlen = max(max_qlen, qlen)
        by_len.setdefault(qlen, []).append(tag)
    if len(p_sub) <= max_seq_length - max_qlen - 3:
        by_len = {max_qlen: list(tags_qlen)}

    out: List[Tuple[str, List[str], List[str], np.ndarray]] = []
    for qlen, tags in by_len.items():
        # clamp: a query longer than the window trains on nothing (matches
        # the SQL twin's `pos < negative` = empty, not a wrap-around slice)
        pieces = p_sub[: max(0, max_seq_length - qlen - 3)]
        if not pieces:
            continue
        scored = [SEP] + pieces
        labs = scorer.top1_tags_battery(tags, scored)[:, 1:]  # (Q, n)
        y = (labs == "I") * 1 + (labs == "O") * 2  # B=0, I=1, O=2
        prevs = scored[:-1]
        for qi, tag in enumerate(tags):
            out.append((tag, pieces, prevs, y[qi].astype(np.int64)))
    return out


def teacher_rows(
    scorer,
    tags_qlen: Dict[str, int],
    passage_tokens: Sequence[str],
    max_seq_length: int = 128,
) -> List[Tuple[str, int, str, str, int]]:
    """Row-at-a-time view of :func:`teacher_arrays` (tests / small corpora):
    one (tag, pos, piece, prev, y) tuple per training token."""
    out: List[Tuple[str, int, str, str, int]] = []
    for tag, pieces, prevs, y in teacher_arrays(
        scorer, tags_qlen, passage_tokens, max_seq_length
    ):
        for pos, (piece, prev, yi) in enumerate(zip(pieces, prevs, y)):
            out.append((tag, pos, piece, prev, int(yi)))
    return out
