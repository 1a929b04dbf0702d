"""Deterministic tokenizer + WordPiece-analog kernel.

The reference's data plane has two tokenization layers:

1. ``passage_tokens``: character-level tokens with ASCII alphanumeric runs
   kept whole (e.g. ``"2019"`` stays one token) — the convention documented
   at /root/reference/README.md:94-167 and consumed everywhere spans are
   rendered (``"".join(tokens[s:e+1])``, entity.py:85-87).
2. WordPiece sub-tokens fed to the model, re-merged after scoring with the
   head sub-token keeping the label (``109 + ##02 -> 10902``,
   /root/reference/api/bert_qasl_predictor.py:81-101).

The sandbox has no HF tokenizer, so the WordPiece analog is a deterministic
fixed-width split: tokens longer than ``PIECE`` chars are cut into
``PIECE``-char pieces with a ``##`` continuation prefix.  The round-trip
``merge(split(t)) == t`` is exact, so post-merge span positions index the
original ``passage_tokens`` — the same invariant the reference relies on.

Sequence assembly mirrors feaproducer (P4/P5): ``[CLS] Q [SEP] P [SEP]`` with
the passage clipped to ``max_seq_length - len(query_pieces) - 3``
(/root/reference/utils/feaproducer.py:221-267).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

CLS = "[CLS]"
SEP = "[SEP]"
PIECE = 4
MAX_SEQ_LENGTH = 512


# RE2's \s set EXACTLY: [ \t\n\r\f].  Python's re.ASCII \s additionally
# matches vertical tab (\x0b), which RE2/DuckDB treat as a regular char —
# the explicit class keeps engine and SQL oracle identical on \v inputs.
_ASCII_WS = re.compile(r"[ \t\n\r\f]+")


def tokenize_text(text: str) -> List[str]:
    """Passage tokenization: split on RE2-whitespace ([ \\t\\n\\r\\f]), then
    keep ASCII alphanumeric runs whole and split everything else
    char-by-char (the reference's numbers-kept-whole character convention,
    README.md:128 ``passage_tokens``).  The explicit whitespace class (not
    ``str.split()``'s Unicode whitespace, not Python's ASCII ``\\s`` which
    adds \\x0b) keeps the kernel identical to the SQL oracle's RE2
    ``[^A-Za-z0-9\\s]`` tokenizer: NBSP, vertical tab and other non-RE2
    spaces are treated as (single-char) tokens by both."""
    out: List[str] = []
    for word in _ASCII_WS.split(text):
        if not word:
            continue
        run = []
        for ch in word:
            if ch.isascii() and ch.isalnum():
                run.append(ch)
            else:
                if run:
                    out.append("".join(run))
                    run = []
                out.append(ch)
        if run:
            out.append("".join(run))
    return out


_WP_MEMO: dict = {}
_WP_MEMO_CAP = 1_000_000


def wp_split(token: str) -> List[str]:
    """WordPiece-analog sub-tokenization (deterministic, vocab-free);
    memoized — corpora have small vocabularies relative to token streams."""
    cached = _WP_MEMO.get(token)
    if cached is not None:
        return cached
    if len(token) <= PIECE:
        pieces = [token]
    else:
        pieces = [token[:PIECE]]
        for i in range(PIECE, len(token), PIECE):
            pieces.append("##" + token[i : i + PIECE])
    if len(_WP_MEMO) < _WP_MEMO_CAP:
        _WP_MEMO[token] = pieces
    return pieces


def wp_split_seq(tokens: Sequence[str]) -> List[str]:
    out: List[str] = []
    for t in tokens:
        out.extend(wp_split(t))
    return out


def assemble(query_tokens: Sequence[str], passage_tokens: Sequence[str],
             max_seq_length: int = MAX_SEQ_LENGTH) -> List[str]:
    """``[CLS] + Q + [SEP] + P + [SEP]`` with passage truncation
    (feaproducer.py:221-267).  Operates on sub-token (WordPiece) level, like
    ``tokenizer(query, passage, truncation=True, max_length=512)`` in
    bert_qasl_predictor.py:54-56."""
    q = wp_split_seq(query_tokens)
    p = wp_split_seq(passage_tokens)
    limit = max_seq_length - len(q) - 3
    p = p[:limit]
    return [CLS] + q + [SEP] + p + [SEP]


def merge_wordpieces(tokens: Sequence[str], labels: Sequence[str]) -> Tuple[List[str], List[str]]:
    """Stitch ``##`` continuations back onto their head token; the head
    token's label survives (bert_qasl_predictor.py:81-101)."""
    out_t: List[str] = []
    out_l: List[str] = []
    for t, lab in zip(tokens, labels):
        if "##" in t:
            out_t[-1] = out_t[-1] + t[2:]
        else:
            out_t.append(t)
            out_l.append(lab)
    return out_t, out_l


def strip_specials(tokens: Sequence[str], labels: Sequence[str]) -> Tuple[List[str], List[str]]:
    """Drop ``[CLS] Q [SEP]`` prefix and trailing ``[SEP]``:
    ``results[first_sep_idx + 1 : -1]`` (bert_qasl_predictor.py:103-106)."""
    first_sep = list(tokens).index(SEP)
    return list(tokens[first_sep + 1 : -1]), list(labels[first_sep + 1 : -1])
