"""Flat SL + CRF decode (model family #4: BertBiLSTMCRF-SL,
/root/reference/api/bert_sl_predictor.py:44-46 ``crf.decode(emissions=
logits)`` — NO class weights on the SL side, unlike QASL;
models/bertbilstmcrf_sl.py).

The 65-label CRF's transition matrix is the deterministic stand-in for
trained weights.  It is **type-tied** — the standard parameter tying for
typed IOB2 tag spaces: ``trans((lp, t) -> (lp', t')) = base[lp][lp'] +
bonus[lp][lp'] * 1[t == t']`` with ``bonus >= 0`` (same-type transitions
never worse than cross-type), START/END tied per label part.  Tying keeps
the Viterbi recursion's per-state max over 65 predecessors collapsible to
five terms (cross-type B-max, cross-type I-max, O, own-type B, own-type I),
which is what makes the DuckDB list-expression twin feasible
(operators/sl_crf_sql.py).

Decode rule: **max-product posterior mode** — at each position pick the
label with the highest best-full-path-through score ``fwd + bwd`` (ties:
lowest label index in the [O, B-t0, I-t0, ...] space).  This agrees with
torchcrf's Viterbi backtrace everywhere the optimum is unique (exact float
ties are precluded by the md5-rational emission construction) and, unlike a
backtrace, is expressible as two LINEAR recursions with no stored
backpointers — the property the SQL twin exploits.  The deviation is
documented here deliberately: it changes which of several EXACTLY-co-optimal
paths is emitted, a set that is empty for this emission family.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .iob2 import Span, decode_bio
from .scorer import DeterministicQAScorer
from .wordpiece import CLS, SEP, wp_split

# --- tied CRF parameters (fixed stand-ins for trained weights) -----------
# base[lp_prev][lp_cur], lp in {B:0, I:1, O:2}; cross-type rate
_rng = np.random.RandomState(23)
BASE = _rng.uniform(-0.2, 0.2, (3, 3))
BASE[2, 1] -= 3.0   # O -> I strongly penalized (IOB2 structure)
BASE[1, 1] -= 0.5   # cross-type I -> I mildly penalized
# bonus[lp_prev][lp_cur] for SAME type, >= 0 so same-type >= cross-type
# (the collapsibility invariant the 5-term max relies on)
BONUS = np.abs(_rng.uniform(0.0, 1.5, (3, 3)))
BONUS[:, 2] = 0.0   # -> O has no type
BONUS[2, :] = 0.0   # O -> has no type
BONUS[0, 1] += 1.5  # B -> I same type strongly favored
BONUS[1, 1] += 1.0  # I -> I same type favored
START = np.array([0.05, -3.0, 0.1])   # B, I, O (can't start with I)
END = np.array([0.02, 0.04, 0.0])


def sl_emissions(
    scorer: DeterministicQAScorer, types: Sequence[str], tokens: Sequence[str]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(eb (n, T), ei (n, T), eo (n,)) — the SL label-space logits of
    kernel/sl.py::DeterministicSLScorer, kept factored by label part."""
    qa = scorer
    h = qa._hash_matrix(tuple(types), tokens)  # (T, n)
    u1 = (h % 997).astype(np.float64) / 997.0
    u2 = ((h >> 10) % 991).astype(np.float64) / 991.0
    l_b = qa.B_GAIN * u1 + qa.B_BIAS
    prev_hot = np.zeros_like(u1)
    hot = (u1 > 0.985) | (u2 > 0.93)
    prev_hot[:, 1:] = hot[:, :-1].astype(np.float64)
    l_i = qa.I_GAIN * u2 + qa.I_BIAS + qa.I_PREV_BOOST * prev_hot
    n = len(tokens)
    return l_b.T, l_i.T, np.full(n, qa.O_BIAS)


def _fwd(eb: np.ndarray, ei: np.ndarray, eo: np.ndarray):
    """Forward max-product scores; yields (vb (n,T), vi (n,T), vo (n,))."""
    n, t = eb.shape
    vb = np.empty((n, t)); vi = np.empty((n, t)); vo = np.empty(n)
    vb[0] = START[0] + eb[0]
    vi[0] = START[1] + ei[0]
    vo[0] = START[2] + eo[0]
    for j in range(1, n):
        gb, gi = vb[j - 1].max(), vi[j - 1].max()
        po, pb, pi = vo[j - 1], vb[j - 1], vi[j - 1]
        vb[j] = np.maximum.reduce([
            np.full(t, po + BASE[2, 0]),
            np.full(t, gb + BASE[0, 0]), np.full(t, gi + BASE[1, 0]),
            pb + (BASE[0, 0] + BONUS[0, 0]), pi + (BASE[1, 0] + BONUS[1, 0]),
        ]) + eb[j]
        vi[j] = np.maximum.reduce([
            np.full(t, po + BASE[2, 1]),
            np.full(t, gb + BASE[0, 1]), np.full(t, gi + BASE[1, 1]),
            pb + (BASE[0, 1] + BONUS[0, 1]), pi + (BASE[1, 1] + BONUS[1, 1]),
        ]) + ei[j]
        vo[j] = max(po + BASE[2, 2], gb + BASE[0, 2], gi + BASE[1, 2]) + eo[j]
    return vb, vi, vo


def _bwd(eb: np.ndarray, ei: np.ndarray, eo: np.ndarray):
    """Backward max-product scores (emission of own position excluded)."""
    n, t = eb.shape
    wb = np.empty((n, t)); wi = np.empty((n, t)); wo = np.empty(n)
    wb[n - 1] = END[0]
    wi[n - 1] = END[1]
    wo[n - 1] = END[2]
    for j in range(n - 2, -1, -1):
        ub = eb[j + 1] + wb[j + 1]
        ui = ei[j + 1] + wi[j + 1]
        uo = eo[j + 1] + wo[j + 1]
        hb, hi = ub.max(), ui.max()
        wb[j] = np.maximum.reduce([
            np.full(t, uo + BASE[0, 2]),
            np.full(t, hb + BASE[0, 0]), np.full(t, hi + BASE[0, 1]),
            ub + (BASE[0, 0] + BONUS[0, 0]), ui + (BASE[0, 1] + BONUS[0, 1]),
        ])
        wi[j] = np.maximum.reduce([
            np.full(t, uo + BASE[1, 2]),
            np.full(t, hb + BASE[1, 0]), np.full(t, hi + BASE[1, 1]),
            ub + (BASE[1, 0] + BONUS[1, 0]), ui + (BASE[1, 1] + BONUS[1, 1]),
        ])
        wo[j] = max(uo + BASE[2, 2], hb + BASE[2, 0], hi + BASE[2, 1])
    return wb, wi, wo


def sl_crf_labels(
    scorer: DeterministicQAScorer, types: Sequence[str], tokens: Sequence[str]
) -> List[str]:
    """Max-product posterior-mode labels over the assembled sequence."""
    n = len(tokens)
    if n == 0:
        return []
    t = len(types)
    eb, ei, eo = sl_emissions(scorer, types, tokens)
    vb, vi, vo = _fwd(eb, ei, eo)
    wb, wi, wo = _bwd(eb, ei, eo)
    # posterior matrix in SL label order [O, B-t0, I-t0, B-t1, ...]
    post = np.empty((n, 1 + 2 * t))
    post[:, 0] = vo + wo
    post[:, 1::2] = vb + wb
    post[:, 2::2] = vi + wi
    ids = post.argmax(axis=1)
    out: List[str] = []
    for i in ids.tolist():
        if i == 0:
            out.append("O")
        else:
            typ = types[(i - 1) // 2]
            out.append(("B-" if (i - 1) % 2 == 0 else "I-") + typ)
    return out


def sl_crf_predict(
    scorer: DeterministicQAScorer,
    types: Sequence[str],
    passage_tokens: Sequence[str],
    pid: int = 0,
    max_seq_length: int = 512,
) -> List[Span]:
    """[CLS] P [SEP] -> CRF posterior decode -> wordpiece merge (head keeps
    label) -> strip specials -> typed IOB2 decode (the SL pipeline of
    api/bert_sl_predictor.py:40-90 with with_bilstmcrf=True)."""
    p_sub: List[str] = []
    for tk in passage_tokens:
        p_sub.extend(wp_split(tk))
    p_sub = p_sub[: max_seq_length - 2]
    seq = [CLS] + p_sub + [SEP]
    labels = sl_crf_labels(scorer, types, seq)
    m_tokens: List[str] = []
    m_labels: List[str] = []
    for tk, lab in zip(seq, labels):
        if "##" in tk:
            m_tokens[-1] = m_tokens[-1] + tk[2:]
        else:
            m_tokens.append(tk)
            m_labels.append(lab)
    m_tokens, m_labels = m_tokens[1:-1], m_labels[1:-1]
    return decode_bio(m_tokens, m_labels, pid=pid)


def sl_crf_decode_bruteforce(
    eb: np.ndarray, ei: np.ndarray, eo: np.ndarray
) -> List[int]:
    """Exponential-time oracle for tests: enumerate every label sequence in
    the (1 + 2T)-label space with the TIED transitions, return the best
    path's label ids.  Only usable for tiny n and T."""
    import itertools

    n, t = eb.shape
    n_labels = 1 + 2 * t

    def em(j: int, s: int) -> float:
        if s == 0:
            return float(eo[j])
        ti, part = (s - 1) // 2, (s - 1) % 2
        return float(eb[j, ti] if part == 0 else ei[j, ti])

    def lp(s: int) -> int:  # label part index: B=0, I=1, O=2
        return 2 if s == 0 else (s - 1) % 2

    def ty(s: int) -> int:
        return -1 if s == 0 else (s - 1) // 2

    def trans(a: int, b: int) -> float:
        v = BASE[lp(a), lp(b)]
        if ty(a) >= 0 and ty(a) == ty(b):
            v = v + BONUS[lp(a), lp(b)]
        return float(v)

    best, best_score = None, -np.inf
    for seq in itertools.product(range(n_labels), repeat=n):
        s = START[lp(seq[0])] + em(0, seq[0])
        for j in range(1, n):
            s += trans(seq[j - 1], seq[j]) + em(j, seq[j])
        s += END[lp(seq[-1])]
        if s > best_score:
            best, best_score = list(seq), s
    return best
