"""IOB2 chunk-decode kernel (the reference's single most correctness-critical
operator).

Semantics re-derived from the reference's scheme truth tables
(/root/reference/utils/seqhelper/src/scheme.py:26-64) and decode automaton
(/root/reference/utils/seqhelper/src/entity.py:43-99):

* the sequence is extended with a sentinel ``("", "O")`` token (entity.py:52);
* at each step the pattern is ``(prev_tag, cur_tag, SAME|DIFF type relation)``;
* a chunk **ends before i** iff ``prev in {B, I}`` and
  (``cur == B`` or (``cur in {I, O}`` and the type differs)) —
  scheme.py:38-47;
* a chunk **starts at i** iff (``cur == B`` and (``prev in {B, I}`` or
  (``prev == O`` and type differs))) or (``cur == I`` and type differs) —
  scheme.py:28-37.  The ``I``-after-different-type repair (scheme.py:53-57)
  is therefore implicit: such an ``I`` both ends the previous chunk and
  starts a new one, exactly as the reference automaton behaves;
* the emitted span is ``(pid, prev_type, begin_offset, i - 1, text)`` with
  ``text = "".join(tokens[begin_offset:i])`` (entity.py:84-91) —
  **inclusive** token positions;
* label parsing: ``tag = label[0]``; ``type = label[1:].split("-", 1)[-1]``
  so ``"O" -> ""``, ``"B-ADD" -> "ADD"``, bare ``"B" -> ""`` (entity.py:64-66).

Two implementations are provided:

``decode_bio``            — a vectorized NumPy kernel (used inside the Spark
                            Arrow UDF; per-token work is elementwise).
``tests/reference_impl.py`` holds an independent sequential re-derivation used
                            as the oracle; parity between the two is the
                            correctness anchor (SURVEY.md §5).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Span = Tuple[int, str, int, int, str]  # (pid, type, start_pos, end_pos, text)


def _parse_labels(labels: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Split IOB2 labels into (tag, type) arrays, reference label parsing."""
    n = len(labels)
    tags = np.empty(n, dtype="U1")
    types = np.empty(n, dtype=object)
    for i, lab in enumerate(labels):
        tags[i] = lab[0] if lab else "O"
        rest = lab[1:]
        # split(delimiter, maxsplit=1)[-1]: "-ADD" -> "ADD", "" -> ""
        types[i] = rest.split("-", 1)[-1] if rest else ""
    return tags, types


def decode_bio(tokens: Sequence[str], labels: Sequence[str], pid: int = 0) -> List[Span]:
    """Decode one IOB2-labelled token sequence into entity spans.

    Vectorized: start/end masks are computed elementwise over the whole
    sequence; the only Python loop runs over chunk *boundaries* (sparse).
    """
    n = len(labels)
    if n == 0:
        return []
    # Extended sequence: sentinel ("", "O") at the end (entity.py:52).
    tags, types = _parse_labels(list(labels) + ["O"])

    prev_tags = np.concatenate((["O"], tags[:-1]))
    prev_types = np.concatenate(([""], types[:-1]))
    same = prev_types == types

    prev_bi = (prev_tags == "B") | (prev_tags == "I")
    cur_b = tags == "B"
    cur_i = tags == "I"
    cur_o = tags == "O"

    # scheme.py:38-47 — is_pre_chunk_end_patterns
    end_mask = prev_bi & (cur_b | ((cur_i | cur_o) & ~same))
    # scheme.py:28-37 — is_cur_chunk_start_patterns
    start_mask = (cur_b & (prev_bi | ((prev_tags == "O") & ~same))) | (cur_i & ~same)

    end_idx = np.flatnonzero(end_mask)
    if end_idx.size == 0:
        return []
    start_idx = np.flatnonzero(start_mask)

    # For an end at i, begin_offset is the last start strictly before i
    # (the automaton processes end before start at the same index), else 0.
    if start_idx.size == 0:
        begins = np.zeros(end_idx.size, dtype=np.int64)
    else:
        pos = np.searchsorted(start_idx, end_idx, side="left") - 1
        begins = np.where(pos >= 0, start_idx[np.clip(pos, 0, None)], 0)

    toks = list(tokens)
    out: List[Span] = []
    for b, e in zip(begins.tolist(), end_idx.tolist()):
        out.append((pid, types[e - 1], int(b), int(e - 1), "".join(toks[b:e])))
    return out


def decode_bio_uniform(
    tokens: Sequence[str], tags: np.ndarray, qtag: str, pid: int = 0
) -> List[Span]:
    """Fast path of :func:`decode_bio` for the QASL battery case where every
    non-O label carries the SAME type (the query's tag, re-attached via F3).

    With one type, the scheme tables collapse to::

        end   = prev in {B, I} and cur in {B, O}
        start = cur == B or (cur == I and prev == O)

    (derived from the general masks by substituting type(X) = qtag for
    X in {B, I} and "" for O).  Verified equal to the general automaton by a
    property test over random tag soups (tests/test_iob2.py).

    ``tags`` is an array of single characters 'B'/'I'/'O' (no sentinel; the
    sentinel "O" is implicit in the mask construction below).
    """
    n = len(tags)
    if n == 0:
        return []
    t = np.asarray(tags, dtype="U1")
    ext = np.concatenate((t, ["O"]))
    prev = np.concatenate((["O"], t))
    prev_bi = (prev == "B") | (prev == "I")
    cur_b = ext == "B"
    cur_o = ext == "O"
    cur_i = ext == "I"

    end_mask = prev_bi & (cur_b | cur_o)
    start_mask = cur_b | (cur_i & (prev == "O"))

    end_idx = np.flatnonzero(end_mask)
    if end_idx.size == 0:
        return []
    start_idx = np.flatnonzero(start_mask)
    if start_idx.size == 0:
        begins = np.zeros(end_idx.size, dtype=np.int64)
    else:
        pos = np.searchsorted(start_idx, end_idx, side="left") - 1
        begins = np.where(pos >= 0, start_idx[np.clip(pos, 0, None)], 0)

    toks = list(tokens)
    out: List[Span] = []
    for b, e in zip(begins.tolist(), end_idx.tolist()):
        out.append((pid, qtag, int(b), int(e - 1), "".join(toks[b:e])))
    return out


def decode_bio_uniform_battery(
    tokens: Sequence[str],
    tag_mat: np.ndarray,
    qtags: Sequence[str],
    pid: int = 0,
) -> List[Span]:
    """All-battery variant of :func:`decode_bio_uniform`: one vectorized
    pass over the whole ``(Q, n)`` tag matrix instead of Q per-row calls.

    Rows are isolated by construction — every row gets an implicit leading
    and trailing "O" (the ``prev``/``ext`` frames below), and in uniform
    decode every chunk's first token is a start (B, or I-after-O via the
    repair rule), so the flattened searchsorted can never pair an end with
    a start from an earlier row.  Numerically identical to looping
    decode_bio_uniform per tag (held to it by the parity tests)."""
    q, n = tag_mat.shape
    if n == 0 or q == 0:
        return []
    t = np.asarray(tag_mat, dtype="U1")
    o_col = np.full((q, 1), "O", dtype="U1")
    ext = np.concatenate((t, o_col), axis=1)     # (Q, n+1): cur frame
    prev = np.concatenate((o_col, t), axis=1)    # (Q, n+1): prev frame

    prev_bi = (prev == "B") | (prev == "I")
    cur_b = ext == "B"
    end_mask = prev_bi & (cur_b | (ext == "O"))
    start_mask = cur_b | ((ext == "I") & (prev == "O"))

    flat_end = np.flatnonzero(end_mask)
    if flat_end.size == 0:
        return []
    flat_start = np.flatnonzero(start_mask)
    pos = np.searchsorted(flat_start, flat_end, side="left") - 1
    begins = flat_start[np.clip(pos, 0, None)]

    width = n + 1
    toks = list(tokens)
    out: List[Span] = []
    for b, e in zip(begins.tolist(), flat_end.tolist()):
        row, s = divmod(b, width)
        e_col = (e - 1) % width
        out.append(
            (pid, qtags[row], int(s), int(e_col), "".join(toks[s : e_col + 1]))
        )
    return out
