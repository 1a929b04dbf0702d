"""Flat sequence-labeling (SL) scorer — the reference's second model family
(BertSLModel, /root/reference/models/bert_sl.py:14-70;
api/bert_sl_predictor.py): one forward pass emits logits over the FULL typed
label space (65 = "O" + B/I x 32 types, tests/test_utils_sl.py:42-109) and
the per-token argmax picks a single type — flat NER, no overlaps (this is
exactly the nesting limitation the QASL battery removes, README's +6-7% F1).

Deterministic analog: the per-type (B, I) emissions reuse the SAME hash
family as the QASL scorer (so SL and QASL are comparable model twins); O is
the shared bias.  Sequence assembly is ``[CLS] P [SEP]``
(feaproducer.py:227-267 SL branch), truncation to ``max_seq - 2``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .iob2 import Span, decode_bio
from .scorer import DeterministicQAScorer
from .wordpiece import CLS, SEP, wp_split


class DeterministicSLScorer:
    """argmax over the typed label space, built on the QA scorer's hashes."""

    def __init__(self, types: Sequence[str]):
        self.types = list(types)
        self._qa = DeterministicQAScorer()

    def top1_labels(self, tokens: Sequence[str]) -> List[str]:
        n = len(tokens)
        if n == 0:
            return []
        qa = self._qa
        h = qa._hash_matrix(tuple(self.types), tokens)  # (T, n)
        u1 = (h % 997).astype(np.float64) / 997.0
        u2 = ((h >> 10) % 991).astype(np.float64) / 991.0
        l_b = qa.B_GAIN * u1 + qa.B_BIAS
        prev_hot = np.zeros_like(u1)
        hot = (u1 > 0.985) | (u2 > 0.93)
        prev_hot[:, 1:] = hot[:, :-1].astype(np.float64)
        l_i = qa.I_GAIN * u2 + qa.I_BIAS + qa.I_PREV_BOOST * prev_hot
        # label space: [O, B-t0, I-t0, B-t1, I-t1, ...]
        logits = np.empty((n, 1 + 2 * len(self.types)))
        logits[:, 0] = qa.O_BIAS
        logits[:, 1::2] = l_b.T
        logits[:, 2::2] = l_i.T
        ids = logits.argmax(axis=1)
        out = []
        for i in ids.tolist():
            if i == 0:
                out.append("O")
            else:
                t = self.types[(i - 1) // 2]
                out.append(("B-" if (i - 1) % 2 == 0 else "I-") + t)
        return out


def sl_merged_labels(
    scorer: DeterministicSLScorer,
    passage_tokens: Sequence[str],
    max_seq_length: int = 512,
) -> tuple:
    """[CLS] P [SEP] -> score -> wordpiece merge (head keeps label) ->
    strip specials: the per-token (tokens, labels) streams the decode
    consumes and the reference's token-level metrics compare
    (eval.py:39-47).  Position i is the i-th passage token surviving the
    subword truncation."""
    p_sub: List[str] = []
    for t in passage_tokens:
        p_sub.extend(wp_split(t))
    p_sub = p_sub[: max_seq_length - 2]
    seq = [CLS] + p_sub + [SEP]
    labels = scorer.top1_labels(seq)
    m_tokens: List[str] = []
    m_labels: List[str] = []
    for t, lab in zip(seq, labels):
        if "##" in t:
            m_tokens[-1] = m_tokens[-1] + t[2:]
        else:
            m_tokens.append(t)
            m_labels.append(lab)
    # strip [CLS] ... [SEP] — SL has no query prefix
    return m_tokens[1:-1], m_labels[1:-1]


def sl_predict(
    scorer: DeterministicSLScorer,
    passage_tokens: Sequence[str],
    pid: int = 0,
    max_seq_length: int = 512,
) -> List[Span]:
    """[CLS] P [SEP] -> score -> wordpiece merge (head keeps label) ->
    strip specials -> typed IOB2 decode (api/bert_sl_predictor.py:40-90)."""
    m_tokens, m_labels = sl_merged_labels(scorer, passage_tokens, max_seq_length)
    return decode_bio(m_tokens, m_labels, pid=pid)
