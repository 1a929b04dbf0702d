"""Pluggable batched QA-scorer kernel.

The reference scores each (query, passage) pair with a BERT-QASL forward pass
producing ``(seq_len, 3)`` logits over the ``{B, I, O}`` QASL label space
(/root/reference/models/bert_qasl.py:15-74), then softmax + top-k
(/root/reference/api/bert_qasl_predictor.py:73-77), re-attaching the query's
type at decode time via ``f"{lp}-{query_tag}"`` (bert_qasl_predictor.py:92-98).

This sandbox has no torch/transformers, so the default scorer is a
**deterministic NumPy QA-tagger** with the exact same interface and batch
shape: per-token 3-logit emissions derived from a 60-bit md5 hash of
``(query_tag, token)`` with a previous-token interaction term (so multi-token
B→I spans occur), softmax, top-k.  Because the kernel is pure and shared by
the Spark UDF and the single-node oracle, the P/R≥0.95 parity gate is exact.
The hash is md5-60bit specifically so the whole scoring pipeline is ALSO
expressible in ANSI SQL (DuckDB twin:
``('0x' || substr(md5(tag || '|' || token), 1, 15))::BIGINT`` — see
operators/mention_sql.py), giving the flagship mention-detection query a
strong external oracle.  A real HF checkpoint can replace
:class:`DeterministicQAScorer` unchanged — the Spark plan (Arrow-batched
iterator UDF) does not care what produces the logits.

Label space (QASL): ``id2label = {0: "B", 1: "I", 2: "O"}``; class weights
``[0.11, 1, 0.16]`` are carried as config for the CRF decode path parity
(bert_qasl_predictor.py:31,67) but — exactly like the reference's softmax
path — are NOT applied in softmax decoding.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..hashing import md5_60

ID2LABEL = {0: "B", 1: "I", 2: "O"}
CLASS_WEIGHTS = np.array([0.11, 1.0, 0.16])  # B, I, O (simqasl_config.json)


def hash60(query_tag: str, token: str) -> int:
    """Stable per-(query_tag, token) 60-bit hash — the shared md5-60
    discipline (ehr_ner_spark/hashing.py) over ``tag|token``."""
    return md5_60(query_tag + "|" + token)


def _token_hashes(query_tag: str, tokens: Sequence[str]) -> np.ndarray:
    return np.fromiter(
        (hash60(query_tag, t) for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x - x.max(axis=axis, keepdims=True)
    e = np.exp(m)
    return e / e.sum(axis=axis, keepdims=True)


class DeterministicQAScorer:
    """Query-conditioned per-token 3-logit emitter (B, I, O).

    Emission design (arbitrary but fixed — it plays the role of trained
    weights): ``u1 = h % 997 / 997`` drives B, ``u2 = (h >> 10) % 991 / 991``
    drives I, O gets a constant bias.  I is additionally boosted when the
    *previous* token was B-favourable, so contiguous B I I ... runs (and
    hence multi-token entities) occur, like a real tagger's transitions.
    """

    B_GAIN, B_BIAS = 10.0, -9.0
    I_GAIN, I_BIAS = 10.0, -8.5
    I_PREV_BOOST = 4.0
    O_BIAS = 2.5

    _MEMO_CAP = 2_000_000  # per-(query_tag) token-hash memo bound

    def __init__(self) -> None:
        self._memo: dict[str, dict[str, int]] = {}
        # battery memo: token -> (Q,) uint64 hash vector per tag-tuple
        self._bmemo: dict[tuple, dict[str, np.ndarray]] = {}

    def _hashes(self, query_tag: str, tokens: Sequence[str]) -> np.ndarray:
        """Memoized per-(query_tag, token) md5-60bit (the model-weight lookup
        is the hot path at corpus scale; vocabularies are small relative to
        token streams, so memoization is a large constant-factor win and the
        md5-vs-crc32 cost difference vanishes)."""
        memo = self._memo.setdefault(query_tag, {})
        out = np.empty(len(tokens), dtype=np.uint64)
        get = memo.get
        for i, t in enumerate(tokens):
            h = get(t)
            if h is None:
                h = hash60(query_tag, t)
                if len(memo) < self._MEMO_CAP:
                    memo[t] = h
            out[i] = h
        return out

    def _hash_matrix(self, tags: tuple, tokens: Sequence[str]) -> np.ndarray:
        """(Q, n) hash matrix with ONE memo lookup per token: the memo maps
        token -> (Q,) vector for this tag tuple, so the battery pays 1/Q of
        the per-tag dict traffic (the dominant cost at corpus scale)."""
        memo = self._bmemo.setdefault(tags, {})
        get = memo.get
        cols = []
        for t in tokens:
            v = get(t)
            if v is None:
                v = np.fromiter(
                    (hash60(q, t) for q in tags), dtype=np.uint64, count=len(tags)
                )
                if len(memo) < self._MEMO_CAP:
                    memo[t] = v
            cols.append(v)
        return np.stack(cols, axis=1)

    def logits(self, query_tag: str, tokens: Sequence[str]) -> np.ndarray:
        n = len(tokens)
        if n == 0:
            return np.zeros((0, 3), dtype=np.float64)
        h = self._hashes(query_tag, tokens)
        u1 = (h % 997).astype(np.float64) / 997.0
        u2 = ((h >> 10) % 991).astype(np.float64) / 991.0
        l_b = self.B_GAIN * u1 + self.B_BIAS
        # previous token B-favourable -> boost I here (vectorized via shift)
        prev_hot = np.zeros(n, dtype=np.float64)
        hot = (u1 > 0.985) | (u2 > 0.93)
        prev_hot[1:] = hot[:-1].astype(np.float64)
        l_i = self.I_GAIN * u2 + self.I_BIAS + self.I_PREV_BOOST * prev_hot
        l_o = np.full(n, self.O_BIAS)
        return np.stack([l_b, l_i, l_o], axis=1)

    def logits_battery(
        self, query_tags: Sequence[str], tokens: Sequence[str]
    ) -> np.ndarray:
        """Vectorized battery logits of shape ``(Q, n, 3)`` — value-identical
        to stacking :meth:`logits` per tag (same elementwise float ops; the
        hash matrix is just gathered once per token instead of per tag).
        Feeds the CRF decode path, which needs raw emissions, not top-1."""
        n = len(tokens)
        q = len(query_tags)
        if n == 0 or q == 0:
            return np.zeros((q, n, 3), dtype=np.float64)
        h = self._hash_matrix(tuple(query_tags), tokens)  # (Q, n)
        u1 = (h % 997).astype(np.float64) / 997.0
        u2 = ((h >> 10) % 991).astype(np.float64) / 991.0
        l_b = self.B_GAIN * u1 + self.B_BIAS
        prev_hot = np.zeros((q, n), dtype=np.float64)
        hot = (u1 > 0.985) | (u2 > 0.93)
        prev_hot[:, 1:] = hot[:, :-1].astype(np.float64)
        l_i = self.I_GAIN * u2 + self.I_BIAS + self.I_PREV_BOOST * prev_hot
        return np.stack([l_b, l_i, np.full((q, n), self.O_BIAS)], axis=2)

    def top1_tags_battery(
        self, query_tags: Sequence[str], tokens: Sequence[str]
    ) -> np.ndarray:
        """Vectorized battery scoring: top-1 tag chars ('B'/'I'/'O') of
        shape ``(len(query_tags), len(tokens))`` — numerically identical to
        per-query ``predict_topk(..., top_k=1)`` (softmax is monotone, so
        top-1 of logits == top-1 of probs; ties break to the lowest label
        id in both paths)."""
        n = len(tokens)
        q = len(query_tags)
        if n == 0 or q == 0:
            return np.empty((q, n), dtype="U1")
        h = self._hash_matrix(tuple(query_tags), tokens)  # (Q, n)
        u1 = (h % 997).astype(np.float64) / 997.0
        u2 = ((h >> 10) % 991).astype(np.float64) / 991.0
        l_b = self.B_GAIN * u1 + self.B_BIAS
        prev_hot = np.zeros((q, n), dtype=np.float64)
        hot = (u1 > 0.985) | (u2 > 0.93)
        prev_hot[:, 1:] = hot[:, :-1].astype(np.float64)
        l_i = self.I_GAIN * u2 + self.I_BIAS + self.I_PREV_BOOST * prev_hot
        logits = np.stack([l_b, l_i, np.full((q, n), self.O_BIAS)], axis=2)
        ids = logits.argmax(axis=2)  # first-occurrence tie-break, like topk
        return np.array(["B", "I", "O"], dtype="U1")[ids]

    def predict_topk(
        self, query_tag: str, tokens: Sequence[str], top_k: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        """softmax + top-k per token (bert_qasl_predictor.py:73-77).

        Returns ``(indices, probs)`` of shape ``(n, top_k)``, ordered by
        descending probability.
        """
        probs = softmax(self.logits(query_tag, tokens))
        order = np.argsort(-probs, axis=1, kind="stable")[:, :top_k]
        return order, np.take_along_axis(probs, order, axis=1)

    def predict_labels(self, query_tag: str, tokens: Sequence[str]) -> List[str]:
        """Top-1 labels with the query type re-attached:
        ``f"{lp}-{query_tag}"`` unless O (bert_qasl_predictor.py:92-98)."""
        idx, _ = self.predict_topk(query_tag, tokens, top_k=1)
        out = []
        for i in idx[:, 0].tolist():
            lp = ID2LABEL[i]
            out.append(f"{lp}-{query_tag}" if lp != "O" else lp)
        return out
