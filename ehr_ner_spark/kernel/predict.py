"""End-to-end per-(document x query) prediction kernel.

Composition mirrors ``BertQASLPredictor.predict_for_one_query`` + ``refine``
(/root/reference/api/bert_qasl_predictor.py:50-116):

    assemble [CLS] Q [SEP] P [SEP] (truncate 512)
      -> score all positions (batched logits; softmax top-k)
      -> wordpiece merge (head keeps label)
      -> strip [CLS] Q [SEP] ... [SEP]
      -> IOB2 decode -> spans

and ``predict_overall`` (bert_qasl_predictor.py:38-48) is the union over the
query battery (the nested-NE overlay W8: overlapping spans of different types
coexist; no cross-type dedup).

This module is pure Python/NumPy — it is BOTH the body of the Spark Arrow UDF
and (driven by a plain loop) the single-node oracle the parity tests compare
against.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .iob2 import Span, decode_bio
from .scorer import ID2LABEL, DeterministicQAScorer
from .wordpiece import assemble, merge_wordpieces, strip_specials, tokenize_text


def predict_one_query(
    scorer: DeterministicQAScorer,
    query_tag: str,
    query_tokens: Sequence[str],
    passage_tokens: Sequence[str],
    pid: int = 0,
    max_seq_length: int = 512,
) -> List[Span]:
    seq = assemble(query_tokens, passage_tokens, max_seq_length)
    idx, _prob = scorer.predict_topk(query_tag, seq, top_k=1)
    labels = []
    for i in idx[:, 0].tolist():
        lp = ID2LABEL[i]
        labels.append(f"{lp}-{query_tag}" if lp != "O" else lp)
    m_tokens, m_labels = merge_wordpieces(seq, labels)
    p_tokens, p_labels = strip_specials(m_tokens, m_labels)
    return decode_bio(p_tokens, p_labels, pid=pid)


def predict_overall(
    scorer: DeterministicQAScorer,
    queries: Dict[str, str],
    passage: str,
    pid: int = 0,
    max_seq_length: int = 512,
) -> List[Span]:
    """Battery fan-out union (predict_overall, bert_qasl_predictor.py:38-48)."""
    passage_tokens = tokenize_text(passage)
    out: List[Span] = []
    for q_tag, query in queries.items():
        q_tokens = tokenize_text(query)
        out.extend(
            predict_one_query(scorer, q_tag, q_tokens, passage_tokens, pid, max_seq_length)
        )
    return out
