"""ANSI-SQL (DuckDB) twin of the CRF-decode battery mention pipeline —
`detect_mentions_crf` replayed as two linear recursive CTEs.

Viterbi is a sequential max-product DP, which relational SQL expresses as:

* **forward pass** (`fwd`): one recursive CTE over passage positions,
  carrying the 3 state scores (vb, vi, vo) AND the 3 backpointers per row.
  The per-tag constant prefix over ``[CLS] Q [SEP]`` — the same for every
  document — is precomputed with the SHARED kernel
  (kernel/crf.py::crf_forward_prefix over kernel/scorer.py logits) and
  embedded as float64 literals (repr round-trips bit-exactly), so the SQL
  recursion starts at the first passage piece;
* **final step** (`fin`/`fsel`): transition into the trailing ``[SEP]``
  (whose I-logit depends on the last passage piece's hot flag — data
  dependent, computed in SQL), add END transitions, argmax;
* **backward pass** (`bt`): a second recursive CTE walking the stored
  backpointers from the last position down.

Every float expression is written in the NumPy kernel's exact op order
(add transition, add emission, then max/compare), so IEEE-754 doubles agree
bit-for-bit and the CASE argmaxes (first-occurrence tie-break: B, I, O)
are the same function as ``np.argmax``.

Reference semantics: crf.decode(emissions = logits * class_weights)
(/root/reference/api/bert_qasl_predictor.py:62-71,
models/crf_layer.py:264-340); class weights [0.11, 1, 0.16]
(bert_qasl_predictor.py:31).
"""

from __future__ import annotations

import numpy as np

from ..kernel.crf import (
    END_TRANSITIONS,
    TRANSITIONS,
    crf_forward_prefix,
)
from ..kernel.scorer import CLASS_WEIGHTS, DeterministicQAScorer
from ..kernel.scorer import DeterministicQAScorer as _S
from ..kernel.wordpiece import CLS, SEP, tokenize_text, wp_split_seq
from ..queries_battery import QUERIES
from .mention_sql import _battery_prelude, _span_decode_ctes


def _f(x) -> str:
    """float64 -> SQL literal.  DuckDB types bare decimal literals as
    DECIMAL (17 fraction digits overflow DECIMAL(18,17) for |x| >= 10), so
    route through a VARCHAR cast: strtod of the shortest repr is the exact
    same double."""
    return f"('{float(x)!r}'::DOUBLE)"


def _crf_tag_values() -> str:
    """(tag, pre_b, pre_i, pre_o) rows: the per-tag Viterbi forward vector
    after ``[CLS] Q [SEP]``, computed with the SAME kernel functions the
    engine's fast path memoizes per worker."""
    scorer = DeterministicQAScorer()
    rows = []
    for tag, question in sorted(QUERIES.items()):
        q_sub = wp_split_seq(tokenize_text(question))
        em_q = scorer.logits(tag, [CLS] + q_sub + [SEP]) * CLASS_WEIGHTS
        pre = crf_forward_prefix(em_q)
        rows.append(f"('{tag}', {_f(pre[0])}, {_f(pre[1])}, {_f(pre[2])})")
    return ",\n        ".join(rows)


def _into(cur: int, vb: str, vi: str, vo: str, em: str) -> tuple[str, str]:
    """Score + backpointer expressions for a Viterbi step into state ``cur``
    given previous scores (vb, vi, vo) and the target emission ``em``.
    Terms are ((prev + T[prev][cur]) + em) exactly like the kernel's
    ``v[:, None] + TRANSITIONS + em[None, :]``."""
    tb, ti, to = (_f(TRANSITIONS[p, cur]) for p in range(3))
    b = f"{vb} + {tb} + {em}"
    i = f"{vi} + {ti} + {em}"
    o = f"{vo} + {to} + {em}"
    score = f"GREATEST({b}, {i}, {o})"
    bp = (f"CASE WHEN {b} >= {i} AND {b} >= {o} THEN 0 "
          f"WHEN {i} >= {o} THEN 1 ELSE 2 END")
    return score, bp


def mentions_crf_oracle_sql(corpus_sql: str, max_seq_length: int = 128) -> str:
    """DuckDB SQL producing exactly ``detect_mentions_crf(corpus(...),
    max_seq_length=...)``'s (doc_id, type, start_pos, end_pos, text) rows."""
    w_b, w_i, w_o = (float(w) for w in CLASS_WEIGHTS)
    eo_lit = _f(_S.O_BIAS * w_o)  # constant O emission, weighted
    endb, endi, endo = (_f(END_TRANSITIONS[s]) for s in range(3))

    # forward anchor (pos 0): from the per-tag prefix literals
    a_vb, a_bb = _into(0, "t.pre_b", "t.pre_i", "t.pre_o", "e.eb")
    a_vi, a_bi = _into(1, "t.pre_b", "t.pre_i", "t.pre_o", "e.ei")
    a_vo, a_bo = _into(2, "t.pre_b", "t.pre_i", "t.pre_o", "e.eo")
    # forward step (pos k -> k+1)
    s_vb, s_bb = _into(0, "f.vb", "f.vi", "f.vo", "e.eb")
    s_vi, s_bi = _into(1, "f.vb", "f.vi", "f.vo", "e.ei")
    s_vo, s_bo = _into(2, "f.vb", "f.vi", "f.vo", "e.eo")
    # final step into the trailing [SEP]
    f_vb, f_bb = _into(0, "vb", "vi", "vo", "sb")
    f_vi, f_bi = _into(1, "vb", "vi", "vo", "si")
    f_vo, f_bo = _into(2, "vb", "vi", "vo", "so")

    base = (
        _battery_prelude(corpus_sql, max_seq_length)
        + f""",
    -- class-weighted emissions + per-position hot flags (the only data the
    -- DP needs); MATERIALIZED: both recursions probe it every iteration
    em AS MATERIALIZED (
      SELECT doc_id, tag, tok, tok_idx, k, pos,
             l_b * {_f(w_b)} AS eb,
             l_i * {_f(w_i)} AS ei,
             {eo_lit}        AS eo,
             (u1 > 0.985 OR u2 > 0.93) AS hot
      FROM lg),
    ctags AS (SELECT * FROM (VALUES
        {_crf_tag_values()}) v(tag, pre_b, pre_i, pre_o)),
    nmax AS MATERIALIZED (
      SELECT doc_id, tag, MAX(pos) AS last_pos FROM em GROUP BY 1, 2),
    fwd AS (
      SELECT e.doc_id, e.tag, e.pos,
             {a_vb} AS vb, {a_vi} AS vi, {a_vo} AS vo,
             {a_bb} AS bb, {a_bi} AS bi, {a_bo} AS bo
      FROM em e JOIN ctags t USING (tag)
      WHERE e.pos = 0
      UNION ALL
      SELECT f.doc_id, f.tag, e.pos,
             {s_vb}, {s_vi}, {s_vo},
             {s_bb}, {s_bi}, {s_bo}
      FROM fwd f
      JOIN em e ON e.doc_id = f.doc_id AND e.tag = f.tag
               AND e.pos = f.pos + 1),
    -- materialization barrier: fwd is consumed by BOTH the final-step CTEs
    -- and every iteration of the backtrace recursion — without it DuckDB
    -- re-executes the whole forward recursion per backtrace step
    fwdm AS MATERIALIZED (SELECT * FROM fwd),
    -- transition into the trailing [SEP]: its I-emission needs the LAST
    -- passage piece's hot flag (data-dependent); B/O parts are literals
    fin AS (
      SELECT f.doc_id, f.tag, n.last_pos, f.vb, f.vi, f.vo,
             ({_f(_S.B_GAIN)} * t.sep_u1 + ({_f(_S.B_BIAS)})) * {_f(w_b)} AS sb,
             ({_f(_S.I_GAIN)} * t.sep_u2 + ({_f(_S.I_BIAS)})
               + {_f(_S.I_PREV_BOOST)} * (CASE WHEN e.hot THEN 1.0 ELSE 0.0 END))
               * {_f(w_i)} AS si,
             {eo_lit} AS so
      FROM fwdm f
      JOIN nmax n ON n.doc_id = f.doc_id AND n.tag = f.tag
                 AND f.pos = n.last_pos
      JOIN em e ON e.doc_id = f.doc_id AND e.tag = f.tag
               AND e.pos = n.last_pos
      JOIN tags t ON t.tag = f.tag),
    fsel AS (
      SELECT doc_id, tag, last_pos,
             {f_vb} + ({endb}) AS fb,
             {f_vi} + ({endi}) AS fi,
             {f_vo} + ({endo}) AS fo,
             {f_bb} AS fbb, {f_bi} AS fbi, {f_bo} AS fbo
      FROM fin),
    -- argmax over final states, then hop the [SEP] backpointer to get the
    -- state at the last passage position
    sel AS (
      SELECT doc_id, tag, last_pos,
             CASE WHEN fb >= fi AND fb >= fo THEN fbb
                  WHEN fi >= fo THEN fbi ELSE fbo END AS st
      FROM fsel),
    bt AS (
      SELECT doc_id, tag, last_pos AS pos, st FROM sel
      UNION ALL
      SELECT b.doc_id, b.tag, b.pos - 1,
             CASE b.st WHEN 0 THEN f.bb WHEN 1 THEN f.bi ELSE f.bo END
      FROM bt b
      JOIN fwdm f ON f.doc_id = b.doc_id AND f.tag = b.tag AND f.pos = b.pos
      WHERE b.pos > 0),
    clab AS (
      SELECT e.doc_id, e.tag, e.tok, e.tok_idx, e.k,
             CASE b.st WHEN 0 THEN 'B' WHEN 1 THEN 'I' ELSE 'O' END AS lab
      FROM em e
      JOIN bt b ON b.doc_id = e.doc_id AND b.tag = e.tag AND b.pos = e.pos)"""
        + _span_decode_ctes("clab")
        + "\n    SELECT doc_id, type, start_pos, end_pos, text FROM m_spans"
    )
    return base.replace("WITH corpus AS", "WITH RECURSIVE corpus AS", 1)
