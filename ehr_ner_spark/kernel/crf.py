"""CRF Viterbi decode kernel (W4) with class-weight emission scaling (W6).

Reference: the BiLSTM-CRF model variants decode with
``crf.decode(emissions = logits * class_weights)``
(/root/reference/api/bert_qasl_predictor.py:66-69); the Viterbi itself is the
standard max-product DP with start/end/transition scores and backtrace
(/root/reference/models/crf_layer.py:264-340).  Training-time forward/
log-likelihood (crf_layer.py:60-262) is a non-goal — the engine consumes
fixed parameters.

Parameters here are deterministic stand-ins for trained weights (seeded),
shaped exactly like torchcrf's: ``start_transitions (T,)``,
``end_transitions (T,)``, ``transitions (T, T)`` over the QASL tag space
``{B, I, O}``."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .scorer import CLASS_WEIGHTS

N_TAGS = 3  # B, I, O

_rng = np.random.RandomState(11)
START_TRANSITIONS = _rng.uniform(-0.1, 0.1, N_TAGS)
END_TRANSITIONS = _rng.uniform(-0.1, 0.1, N_TAGS)
TRANSITIONS = _rng.uniform(-0.1, 0.1, (N_TAGS, N_TAGS))
# encode IOB2 structure the way a trained CRF would: O->I strongly penalized,
# B->I / I->I favored, O sticky and entity entry costly (so span density
# stays in the same regime as the softmax path instead of everything
# collapsing into long I-runs; values fixed, deterministic)
TRANSITIONS[2, 1] -= 3.0   # O -> I
TRANSITIONS[0, 1] += 1.5   # B -> I
TRANSITIONS[1, 1] += 1.0   # I -> I
TRANSITIONS[2, 2] += 1.5   # O -> O (outside is sticky)
TRANSITIONS[2, 0] -= 1.5   # O -> B (entering an entity costs)
TRANSITIONS[1, 0] -= 1.0   # I -> B (immediate re-entry costs)
START_TRANSITIONS[1] -= 3.0  # can't start with I


def viterbi_decode(
    emissions: np.ndarray,
    mask: Sequence[bool] | None = None,
    class_weights: np.ndarray | None = CLASS_WEIGHTS,
) -> List[int]:
    """Single-sequence Viterbi over ``(seq_len, N_TAGS)`` emissions.

    ``class_weights`` multiplies emissions first (W6,
    bert_qasl_predictor.py:67); pass None to skip."""
    em = np.asarray(emissions, dtype=np.float64)
    if class_weights is not None:
        em = em * np.asarray(class_weights, dtype=np.float64)
    n = em.shape[0]
    if mask is not None:
        keep = np.asarray(mask, dtype=bool)
        em = em[keep]
        n = em.shape[0]
    if n == 0:
        return []

    score = START_TRANSITIONS + em[0]
    history = np.zeros((n - 1, N_TAGS), dtype=np.int64) if n > 1 else None
    for i in range(1, n):
        # broadcast: score[prev] + transitions[prev, cur] + emission[cur]
        combined = score[:, None] + TRANSITIONS + em[i][None, :]
        best_prev = combined.argmax(axis=0)
        score = combined[best_prev, np.arange(N_TAGS)]
        history[i - 1] = best_prev
    score = score + END_TRANSITIONS

    best_last = int(score.argmax())
    path = [best_last]
    for i in range(n - 2, -1, -1):
        path.append(int(history[i][path[-1]]))
    path.reverse()
    return path


def crf_forward_prefix(em_w: np.ndarray) -> np.ndarray:
    """Max-product forward scores after consuming the ``(m, 3)``
    already-class-weighted emissions sequentially from START.  Float ops are
    written in EXACTLY :func:`viterbi_decode`'s order (add transition, add
    emission, then max), so composing ``crf_forward_prefix(prefix_em)`` with
    a continuation is bitwise identical to one long forward pass — the
    invariant both the battery fast path and the SQL oracle rely on (the
    prefix over ``[CLS] Q [SEP]`` is a per-tag constant embedded as float64
    literals)."""
    v = START_TRANSITIONS + em_w[0]
    for i in range(1, em_w.shape[0]):
        v = (v[:, None] + TRANSITIONS + em_w[i][None, :]).max(axis=0)
    return v


def viterbi_battery(
    prefix: np.ndarray, em_w: np.ndarray, final_em_w: np.ndarray
) -> np.ndarray:
    """Vectorized continuation Viterbi for the whole query battery.

    ``prefix (Q, 3)``: per-tag forward scores after ``[CLS] Q [SEP]``;
    ``em_w (Q, n, 3)``: class-weighted passage-piece emissions;
    ``final_em_w (Q, 3)``: the trailing ``[SEP]`` emissions.
    Returns ``(Q, n)`` int states (0=B, 1=I, 2=O) over the passage pieces —
    bitwise identical to running :func:`viterbi_decode` per tag over the
    full assembled sequence and slicing out the passage region (parity held
    by tests/test_crf_detect.py)."""
    q, n, _ = em_w.shape
    v = prefix
    bps = np.empty((n, q, N_TAGS), dtype=np.int64)
    for t in range(n):
        comb = v[:, :, None] + TRANSITIONS[None, :, :] + em_w[:, t][:, None, :]
        bps[t] = comb.argmax(axis=1)
        v = comb.max(axis=1)
    combf = v[:, :, None] + TRANSITIONS[None, :, :] + final_em_w[:, None, :]
    bpf = combf.argmax(axis=1)
    v = combf.max(axis=1) + END_TRANSITIONS
    last = v.argmax(axis=1)
    states = np.empty((q, n), dtype=np.int64)
    qi = np.arange(q)
    s = bpf[qi, last]
    for t in range(n - 1, -1, -1):
        states[:, t] = s
        if t > 0:
            s = bps[t][qi, s]
    return states


def crf_sequence_score(em_w: np.ndarray, tags: Sequence[int]) -> float:
    """Unnormalized path score: START + sum(transition + emission) + END
    (crf_layer.py:169-214 ``_compute_score``, single sequence)."""
    t = list(tags)
    s = START_TRANSITIONS[t[0]] + em_w[0, t[0]]
    for i in range(1, len(t)):
        s = s + TRANSITIONS[t[i - 1], t[i]] + em_w[i, t[i]]
    return float(s + END_TRANSITIONS[t[-1]])


def crf_log_partition(em_w: np.ndarray) -> float:
    """log Z via the sum-product forward recursion (crf_layer.py:216-262
    ``_compute_normalizer``): the W5 forward algorithm, consumed here
    inference-side for path confidence = score - logZ (the commented-out
    confidence line at bert_qasl_predictor.py:68).  The training LOOP that
    would backprop through this remains a non-goal."""
    v = START_TRANSITIONS + em_w[0]
    for i in range(1, em_w.shape[0]):
        x = v[:, None] + TRANSITIONS + em_w[i][None, :]
        m = x.max(axis=0)
        v = np.log(np.exp(x - m[None, :]).sum(axis=0)) + m
    m = (v + END_TRANSITIONS).max()
    return float(np.log(np.exp((v + END_TRANSITIONS) - m).sum()) + m)


def viterbi_decode_bruteforce(
    emissions: np.ndarray,
    class_weights: np.ndarray | None = CLASS_WEIGHTS,
) -> List[int]:
    """Exponential-time oracle for tests: enumerate every tag sequence."""
    import itertools

    em = np.asarray(emissions, dtype=np.float64)
    if class_weights is not None:
        em = em * np.asarray(class_weights, dtype=np.float64)
    n = em.shape[0]
    best, best_score = None, -np.inf
    for seq in itertools.product(range(N_TAGS), repeat=n):
        s = START_TRANSITIONS[seq[0]] + em[0, seq[0]]
        for i in range(1, n):
            s += TRANSITIONS[seq[i - 1], seq[i]] + em[i, seq[i]]
        s += END_TRANSITIONS[seq[-1]]
        if s > best_score:
            best, best_score = list(seq), s
    return best
