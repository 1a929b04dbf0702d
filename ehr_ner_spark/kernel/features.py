"""Featurization kernel: spans -> BIO label vectors -> fixed-length
InputFeatures, mirroring the reference featurizer
(/root/reference/utils/feaproducer.py):

* P1 SL label painting  — ``labels[start] = B-type``, interior ``I-type``
  over an all-"O" vector (feaproducer.py:124-141)
* P2 QASL label painting — per (passage x query): only spans whose type
  matches the query paint bare ``B``/``I`` (feaproducer.py:143-163)
* P3 WordPiece alignment — first sub-token keeps the label, continuations
  get ``pad_token_label_id = -100`` (feaproducer.py:205-214)
* P4 sequence assembly  — ``[CLS] Q [SEP] P [SEP]`` with segment ids 0/1
  (feaproducer.py:227-267)
* P5 truncation         — passage clipped to ``max_seq - len(query) - 3``
  (feaproducer.py:221-225)
* P6 padding + mask     — right-pad to ``max_seq_length``; attention 1/0
  (feaproducer.py:272-296), with the reference's length asserts
  (feaproducer.py:293-296) preserved.

Vocabulary is a deterministic md5-hash-vocab (no HF tokenizer in the
sandbox); ids are stable across processes so features are reproducible, and
the hash is the same md5-60bit family as the scorer so the whole featurizer
has a DuckDB SQL twin (operators/mention_sql.py::featurize_oracle_sql).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .scorer import hash60
from .wordpiece import CLS, SEP, wp_split

PAD_TOKEN_LABEL_ID = -100
PAD_ID = 0
CLS_ID = 101
SEP_ID = 102
VOCAB_OFFSET = 1000
VOCAB_SIZE = 30000
MAX_SEQ_LENGTH = 512


def token_id(token: str) -> int:
    """md5-60bit hash-vocab id (DuckDB twin:
    ``1000 + ('0x' || substr(md5('vocab|' || t), 1, 15))::BIGINT % 30000``)."""
    if token == CLS:
        return CLS_ID
    if token == SEP:
        return SEP_ID
    return VOCAB_OFFSET + hash60("vocab", token) % VOCAB_SIZE


def paint_labels_sl(n_tokens: int, spans: Sequence[Tuple[str, int, int]]) -> List[str]:
    """P1: (type, start, end) spans -> per-token typed BIO labels."""
    labels = ["O"] * n_tokens
    for typ, s, e in spans:
        if s < 0 or e >= n_tokens:
            continue
        labels[s] = f"B-{typ}"
        for i in range(s + 1, e + 1):
            labels[i] = f"I-{typ}"
    return labels


def paint_labels_qasl(
    n_tokens: int, spans: Sequence[Tuple[str, int, int]], ner_type: str
) -> List[str]:
    """P2: only spans of the query's type are painted, with BARE B/I
    (the type is carried by the query, re-attached at decode — F3)."""
    labels = ["O"] * n_tokens
    for typ, s, e in spans:
        if typ != ner_type or s < 0 or e >= n_tokens:
            continue
        labels[s] = "B"
        for i in range(s + 1, e + 1):
            labels[i] = "I"
    return labels


def featurize_qasl(
    query_tokens: Sequence[str],
    passage_tokens: Sequence[str],
    passage_labels: Sequence[str],
    label_map: Dict[str, int],
    max_seq_length: int = MAX_SEQ_LENGTH,
) -> Dict[str, List[int]]:
    """P3-P6: one (query x passage) pair -> fixed-length feature vectors."""
    # P3: sub-tokenize with label alignment
    q_sub = [p for t in query_tokens for p in wp_split(t)]
    p_sub: List[str] = []
    p_lab: List[int] = []
    for tok, lab in zip(passage_tokens, passage_labels):
        pieces = wp_split(tok)
        p_sub.extend(pieces)
        p_lab.append(label_map[lab])
        p_lab.extend([PAD_TOKEN_LABEL_ID] * (len(pieces) - 1))

    # P5: truncation
    limit = max_seq_length - len(q_sub) - 3
    p_sub = p_sub[:limit]
    p_lab = p_lab[:limit]

    # P4: [CLS] Q [SEP] P [SEP], segments 0 for query side, 1 for passage
    tokens = [CLS] + list(q_sub) + [SEP] + p_sub + [SEP]
    input_ids = [token_id(t) for t in tokens]
    label_ids = (
        [PAD_TOKEN_LABEL_ID] * (len(q_sub) + 2) + p_lab + [PAD_TOKEN_LABEL_ID]
    )
    token_type_ids = [0] * (len(q_sub) + 2) + [1] * (len(p_sub) + 1)
    attention_mask = [1] * len(tokens)

    # P6: right-pad to max_seq_length
    pad = max_seq_length - len(input_ids)
    input_ids += [PAD_ID] * pad
    attention_mask += [0] * pad
    token_type_ids += [0] * pad
    label_ids += [PAD_TOKEN_LABEL_ID] * pad

    # feaproducer.py:293-296 length asserts, preserved verbatim in spirit
    assert len(input_ids) == max_seq_length
    assert len(attention_mask) == max_seq_length
    assert len(token_type_ids) == max_seq_length
    assert len(label_ids) == max_seq_length
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "token_type_ids": token_type_ids,
        "label_ids": label_ids,
    }


def get_labels(labels: Sequence[str]) -> Tuple[List[str], Dict[str, int]]:
    """S4 label-vocabulary semantics (feaproducer.py:353-360): prepend "O"
    if absent; map label -> id."""
    labs = list(labels)
    if "O" not in labs:
        labs = ["O"] + labs
    return labs, {l: i for i, l in enumerate(labs)}
