"""ANSI-SQL (DuckDB) twin of SL-CRF mention detection
(operators/sl_detect.py::detect_mentions_sl_crf, kernel/sl_crf.py).

The 65-label CRF decode is replayed with LIST-typed recursive CTEs: the
per-document state is one row carrying ``(v_O DOUBLE, v_B DOUBLE[T],
v_I DOUBLE[T])``; the type-tied transition structure collapses each
per-state max over 65 predecessors to a GREATEST over five terms
(O, cross-type B-max via list_max, cross-type I-max, own-type B, own-type I
— see kernel/sl_crf.py's tying invariant ``bonus >= 0``).  The decode rule
is the kernel's max-product posterior mode (``fwd + bwd`` argmax per
position), which needs NO backpointers — two linear recursions, one row per
(doc, position) each, regardless of the 65-state space.

Float discipline: every expression mirrors the NumPy kernel's op order
(scalar adds, elementwise list adds, max) so doubles agree bit-for-bit;
transition/START/END literals go through ``'…'::DOUBLE`` (strtod of the
shortest repr is exact).

Reference semantics: crf.decode(emissions=logits) — no class weights on the
SL side (/root/reference/api/bert_sl_predictor.py:44-46;
models/bertbilstmcrf_sl.py).
"""

from __future__ import annotations

from ..kernel.scorer import DeterministicQAScorer as _S
from ..kernel.sl_crf import BASE, BONUS, END, START
from ..queries_battery import QUERIES
from .mention_sql import TOKEN_RE, PIECE, _sl_types_values, sl_typed_decode_tail


def _f(x) -> str:
    return f"('{float(x)!r}'::DOUBLE)"


def sl_crf_oracle_sql(corpus_sql: str, max_seq_length: int = 128) -> str:
    """DuckDB SQL producing exactly ``detect_mentions_sl_crf(corpus(...),
    max_seq_length=...)``'s (doc_id, type, start_pos, end_pos, text) rows."""
    n_types = len(QUERIES)
    limit = max_seq_length - 2
    g, bb = _S.B_GAIN, _S.B_BIAS
    ig, ib, pb = _S.I_GAIN, _S.I_BIAS, _S.I_PREV_BOOST
    ob = _S.O_BIAS
    # tied transition literals: b<from><to>, d = cross-type, s = same-type
    # (BASE + BONUS, the scalar the kernel precomputes before broadcasting)
    bBBd, bBId, bBO = _f(BASE[0, 0]), _f(BASE[0, 1]), _f(BASE[0, 2])
    bIBd, bIId, bIO = _f(BASE[1, 0]), _f(BASE[1, 1]), _f(BASE[1, 2])
    bOB, bOI, bOO = _f(BASE[2, 0]), _f(BASE[2, 1]), _f(BASE[2, 2])
    cBB, cBI = _f(BASE[0, 0] + BONUS[0, 0]), _f(BASE[0, 1] + BONUS[0, 1])
    cIB, cII = _f(BASE[1, 0] + BONUS[1, 0]), _f(BASE[1, 1] + BONUS[1, 1])
    sB, sI, sO = _f(START[0]), _f(START[1]), _f(START[2])
    eB, eI, eO = _f(END[0]), _f(END[1]), _f(END[2])
    T = n_types

    base = f"""
    WITH RECURSIVE corpus AS ({corpus_sql}),
    toks AS (
      SELECT doc_id, (u.s).tok AS tok, (u.s).i - 1 AS tok_idx
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 regexp_extract_all(content, '{TOKEN_RE}'),
                 (x, i) -> {{'tok': x, 'i': i}})) AS s
        FROM corpus) u),
    pieces AS (
      SELECT * FROM (
        SELECT doc_id, tok, tok_idx, k,
               CASE WHEN k = 0 THEN substr(tok, 1, {PIECE})
                    ELSE '##' || substr(tok, k * {PIECE} + 1, {PIECE})
               END AS piece,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tok_idx, k) - 1 AS pos
        FROM (SELECT doc_id, tok, tok_idx,
                     unnest(range((length(tok) + {PIECE} - 1) // {PIECE})) AS k
              FROM toks))
      WHERE pos < {limit}),
    types AS (
      SELECT ti, typ,
             (('0x' || substr(md5(typ || '|' || '[CLS]'), 1, 15))::BIGINT % 997) / 997.0 AS cls_u1,
             ((('0x' || substr(md5(typ || '|' || '[CLS]'), 1, 15))::BIGINT >> 10) % 991) / 991.0 AS cls_u2,
             (('0x' || substr(md5(typ || '|' || '[SEP]'), 1, 15))::BIGINT % 997) / 997.0 AS sep_u1,
             ((('0x' || substr(md5(typ || '|' || '[SEP]'), 1, 15))::BIGINT >> 10) % 991) / 991.0 AS sep_u2
      FROM (VALUES
        {_sl_types_values()}) v(ti, typ)),
    scoredt AS (
      SELECT p.doc_id, p.pos, t.ti,
             (h % 997) / 997.0 AS u1,
             ((h >> 10) % 991) / 991.0 AS u2,
             (t.cls_u1 > 0.985 OR t.cls_u2 > 0.93) AS cls_hot
      FROM pieces p
      CROSS JOIN types t
      CROSS JOIN LATERAL (SELECT ('0x' || substr(md5(t.typ || '|' || p.piece), 1, 15))::BIGINT AS h) hh),
    plog AS (
      SELECT doc_id, pos, ti,
             {g} * u1 + ({bb}) AS l_b,
             {ig} * u2 + ({ib})
               + {pb} * (CASE WHEN COALESCE(
                     LAG(u1 > 0.985 OR u2 > 0.93) OVER
                       (PARTITION BY doc_id, ti ORDER BY pos), cls_hot)
                   THEN 1.0 ELSE 0.0 END) AS l_i,
             (u1 > 0.985 OR u2 > 0.93) AS hot
      FROM scoredt),
    npiece AS (SELECT doc_id, MAX(pos) + 1 AS n_p FROM pieces GROUP BY 1),
    -- emission rows over the ASSEMBLED sequence [CLS] P [SEP]:
    -- seqpos 0 = [CLS] (prev_hot = 0), 1..n = pieces, n+1 = [SEP]
    -- (prev_hot = hot of the last piece, per type)
    emr AS (
      SELECT n.doc_id, 0 AS seqpos, t.ti,
             {g} * t.cls_u1 + ({bb}) AS l_b,
             {ig} * t.cls_u2 + ({ib}) AS l_i
      FROM npiece n CROSS JOIN types t
      UNION ALL
      SELECT doc_id, pos + 1, ti, l_b, l_i FROM plog
      UNION ALL
      SELECT n.doc_id, n.n_p + 1, t.ti,
             {g} * t.sep_u1 + ({bb}),
             {ig} * t.sep_u2 + ({ib})
               + {pb} * (CASE WHEN lh.hot THEN 1.0 ELSE 0.0 END)
      FROM npiece n
      JOIN types t ON TRUE
      JOIN plog lh ON lh.doc_id = n.doc_id AND lh.ti = t.ti
                  AND lh.pos = n.n_p - 1),
    emw AS MATERIALIZED (
      SELECT doc_id, seqpos,
             list(l_b ORDER BY ti) AS eb,
             list(l_i ORDER BY ti) AS ei,
             {_f(ob)} AS eo
      FROM emr GROUP BY doc_id, seqpos),
    lastpos AS MATERIALIZED (
      SELECT doc_id, MAX(seqpos) AS last_seqpos FROM emw GROUP BY 1),
    fwd AS (
      SELECT doc_id, seqpos,
             {sO} + eo AS vo,
             list_transform(eb, x -> {sB} + x) AS vb,
             list_transform(ei, x -> {sI} + x) AS vi
      FROM emw WHERE seqpos = 0
      UNION ALL
      SELECT u.doc_id, u.seqpos,
             GREATEST(u.vo + {bOO}, u.gb + {bBO}, u.gi + {bIO}) + u.eo,
             list_transform(range({T}), i ->
               GREATEST(u.vo + {bOB}, u.gb + {bBBd}, u.gi + {bIBd},
                        u.vb[i + 1] + {cBB}, u.vi[i + 1] + {cIB})
               + u.eb[i + 1]),
             list_transform(range({T}), i ->
               GREATEST(u.vo + {bOI}, u.gb + {bBId}, u.gi + {bIId},
                        u.vb[i + 1] + {cBI}, u.vi[i + 1] + {cII})
               + u.ei[i + 1])
      FROM (SELECT f.doc_id, e.seqpos, f.vo, f.vb, f.vi,
                   list_max(f.vb) AS gb, list_max(f.vi) AS gi,
                   e.eb, e.ei, e.eo
            FROM fwd f
            JOIN emw e ON e.doc_id = f.doc_id AND e.seqpos = f.seqpos + 1) u),
    fwdm AS MATERIALIZED (SELECT * FROM fwd),
    bwd AS (
      SELECT doc_id, last_seqpos AS seqpos,
             {eO} AS wo,
             list_transform(range({T}), i -> {eB}) AS wb,
             list_transform(range({T}), i -> {eI}) AS wi
      FROM lastpos
      UNION ALL
      SELECT u.doc_id, u.seqpos,
             GREATEST(u.uo + {bOO}, u.hb + {bOB}, u.hi + {bOI}),
             list_transform(range({T}), i ->
               GREATEST(u.uo + {bBO}, u.hb + {bBBd}, u.hi + {bBId},
                        u.ub[i + 1] + {cBB}, u.ui[i + 1] + {cBI})),
             list_transform(range({T}), i ->
               GREATEST(u.uo + {bIO}, u.hb + {bIBd}, u.hi + {bIId},
                        u.ub[i + 1] + {cIB}, u.ui[i + 1] + {cII}))
      FROM (SELECT *, list_max(ub) AS hb, list_max(ui) AS hi
            FROM (SELECT b.doc_id, b.seqpos - 1 AS seqpos,
                         e.eo + b.wo AS uo,
                         list_transform(range({T}), i -> e.eb[i + 1] + b.wb[i + 1]) AS ub,
                         list_transform(range({T}), i -> e.ei[i + 1] + b.wi[i + 1]) AS ui
                  FROM bwd b
                  JOIN emw e ON e.doc_id = b.doc_id AND e.seqpos = b.seqpos
                  WHERE b.seqpos > 0)) u),
    bwdm AS MATERIALIZED (SELECT * FROM bwd),
    post AS MATERIALIZED (
      SELECT f.doc_id, f.seqpos,
             f.vo + w.wo AS so,
             list_transform(range({T}), i -> f.vb[i + 1] + w.wb[i + 1]) AS sb,
             list_transform(range({T}), i -> f.vi[i + 1] + w.wi[i + 1]) AS si
      FROM fwdm f
      JOIN bwdm w ON w.doc_id = f.doc_id AND w.seqpos = f.seqpos),
    pcand AS (
      SELECT doc_id, seqpos, 0 AS label_idx, so AS score, 'O' AS lp, '' AS typ
      FROM post
      UNION ALL
      SELECT p.doc_id, p.seqpos, 1 + 2 * t.ti, p.sb[t.ti + 1], 'B', t.typ
      FROM post p CROSS JOIN types t
      UNION ALL
      SELECT p.doc_id, p.seqpos, 2 + 2 * t.ti, p.si[t.ti + 1], 'I', t.typ
      FROM post p CROSS JOIN types t),
    bestl AS (
      SELECT doc_id, seqpos, lp, typ FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, seqpos
                                     ORDER BY score DESC, label_idx ASC) AS rn
        FROM pcand) WHERE rn = 1),
    best AS (
      SELECT p.doc_id, p.tok, p.tok_idx, p.k, b.lp, b.typ
      FROM pieces p
      JOIN bestl b ON b.doc_id = p.doc_id AND b.seqpos = p.pos + 1)"""
    return base + sl_typed_decode_tail()
