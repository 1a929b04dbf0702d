"""Single-node sequential oracle — an independent re-derivation of the
reference's decode automaton and prediction loop, kept deliberately
loop-structured (like /root/reference/utils/seqhelper/src/entity.py:43-99)
so it shares no code shape with the vectorized Spark kernel it checks.

The scorer itself (DeterministicQAScorer) IS shared: it plays the role of
the trained model weights — both runs must consume identical "weights" for
the P/R gate to be meaningful.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ehr_ner_spark.kernel.scorer import ID2LABEL, DeterministicQAScorer
from ehr_ner_spark.kernel.wordpiece import (
    CLS,
    SEP,
    PIECE,
    tokenize_text,
)

Span = Tuple[int, str, int, int, str]

# -- scheme truth tables, transcribed from scheme.py:26-64 (as (prev, cur,
#    same?) triples) --------------------------------------------------------
_CHUNK_START = {
    ("B", "B", True), ("B", "B", False), ("B", "I", False),
    ("I", "B", True), ("I", "B", False), ("I", "I", False),
    ("O", "B", False), ("O", "I", False),
}
_CHUNK_END = {
    ("B", "B", True), ("B", "B", False), ("B", "I", False), ("B", "O", False),
    ("I", "B", True), ("I", "B", False), ("I", "I", False), ("I", "O", False),
}


def oracle_decode(tokens: Sequence[str], labels: Sequence[str], pid: int = 0) -> List[Span]:
    """Sequential IOB2 automaton (entity.py:58-99 semantics)."""
    seq = list(zip(tokens, labels)) + [("", "O")]
    prev_tag, prev_type = "O", ""
    begin = 0
    chunks: List[Span] = []
    for idx, (_tok, label) in enumerate(seq):
        cur_tag = label[0]
        cur_type = label[1:].split("-", 1)[-1]
        pat = (prev_tag, cur_tag, prev_type == cur_type)
        if pat in _CHUNK_END:
            text = "".join(t for t, _ in seq[begin:idx])
            chunks.append((pid, prev_type, begin, idx - 1, text))
        if pat in _CHUNK_START:
            begin = idx
        prev_tag, prev_type = cur_tag, cur_type
    return chunks


def _wp(token: str) -> List[str]:
    if len(token) <= PIECE:
        return [token]
    return [token[:PIECE]] + ["##" + token[i:i + PIECE] for i in range(PIECE, len(token), PIECE)]


def oracle_predict_one_query(
    scorer: DeterministicQAScorer,
    q_tag: str,
    query: str,
    passage_tokens: Sequence[str],
    pid: int = 0,
    max_seq_length: int = 512,
) -> List[Span]:
    """Sequential analog of predict_for_one_query + refine
    (bert_qasl_predictor.py:50-116), loop-per-token like the reference."""
    q_sub = [p for t in tokenize_text(query) for p in _wp(t)]
    p_sub = [p for t in passage_tokens for p in _wp(t)]
    p_sub = p_sub[: max_seq_length - len(q_sub) - 3]
    sub_tokens = [CLS] + q_sub + [SEP] + p_sub + [SEP]

    idx, _prob = scorer.predict_topk(q_tag, sub_tokens, top_k=1)
    results: List[Tuple[str, str]] = []
    for i, t in enumerate(sub_tokens):
        lp = ID2LABEL[int(idx[i, 0])]
        lab = f"{lp}-{q_tag}" if lp != "O" else lp
        if "##" in t:
            head_tok, head_lab = results.pop()
            results.append((head_tok + t[2:], head_lab))
        else:
            results.append((t, lab))
    first_sep = [t for t, _ in results].index(SEP)
    results = results[first_sep + 1 : -1]
    toks = [t for t, _ in results]
    labs = [l for _, l in results]
    return oracle_decode(toks, labs, pid=pid)


def oracle_predict_overall(
    scorer: DeterministicQAScorer,
    queries: Dict[str, str],
    passage: str,
    pid: int = 0,
) -> List[Span]:
    passage_tokens = tokenize_text(passage)
    out: List[Span] = []
    for q_tag, q in queries.items():
        out.extend(oracle_predict_one_query(scorer, q_tag, q, passage_tokens, pid))
    return out
