"""DuckDB twin of operators/crf_confidence.py — CRF path confidence.

Three pieces over the shared emission CTEs of the battery prelude:

* the passage-local Viterbi path: the same forward+backtrace recursion
  shape as crf_sql.py, anchored at START (no query prefix — the operator
  is defined passage-local precisely so this twin stays linear);
* the path score: START + END + SUM(emission at path) + SUM(transition
  between consecutive path states) — plain joins; SUM order differs from
  the kernel's sequential accumulation by float ulps, absorbed by the
  shared round-6 output contract;
* log Z: a sum-product (log-sum-exp) forward recursion whose per-step max
  shift and exp/ln term order mirror kernel/crf.py::crf_log_partition —
  libm-vs-NumPy exp differs in the last ulp, which round-6 absorbs.
"""

from __future__ import annotations

from ..kernel.crf import END_TRANSITIONS, START_TRANSITIONS, TRANSITIONS
from ..kernel.scorer import CLASS_WEIGHTS
from ..kernel.scorer import DeterministicQAScorer as _S
from .crf_sql import _f, _into
from .mention_sql import _battery_prelude


def _lse_into(cur: int, zb: str, zi: str, zo: str, em: str) -> str:
    """log-sum-exp step into state ``cur``: ln(sum(exp(x - m))) + m with
    x ordered [from B, from I, from O] like the kernel's axis-0 sum."""
    tb, ti, to = (_f(TRANSITIONS[p, cur]) for p in range(3))
    b = f"{zb} + {tb} + {em}"
    i = f"{zi} + {ti} + {em}"
    o = f"{zo} + {to} + {em}"
    m = f"GREATEST({b}, {i}, {o})"
    return (f"ln(exp(({b}) - ({m})) + exp(({i}) - ({m})) + exp(({o}) - ({m})))"
            f" + ({m})")


def crf_confidence_oracle_sql(corpus_sql: str, max_seq_length: int = 128) -> str:
    w_b, w_i, w_o = (float(w) for w in CLASS_WEIGHTS)
    eo_lit = _f(_S.O_BIAS * w_o)
    sB, sI, sO = (_f(START_TRANSITIONS[s]) for s in range(3))
    eB, eI, eO = (_f(END_TRANSITIONS[s]) for s in range(3))

    s_vb, s_bb = _into(0, "f.vb", "f.vi", "f.vo", "e.eb")
    s_vi, s_bi = _into(1, "f.vb", "f.vi", "f.vo", "e.ei")
    s_vo, s_bo = _into(2, "f.vb", "f.vi", "f.vo", "e.eo")
    z_b = _lse_into(0, "f.zb", "f.zi", "f.zo", "e.eb")
    z_i = _lse_into(1, "f.zb", "f.zi", "f.zo", "e.ei")
    z_o = _lse_into(2, "f.zb", "f.zi", "f.zo", "e.eo")
    # transition literal lookup for consecutive path states
    trans_case = "CASE " + " ".join(
        f"WHEN p.st = {a} AND c.st = {b} THEN {_f(TRANSITIONS[a, b])}"
        for a in range(3) for b in range(3)
    ) + " END"

    base = (
        _battery_prelude(corpus_sql, max_seq_length)
        + f""",
    em AS MATERIALIZED (
      SELECT doc_id, tag, pos,
             l_b * {_f(w_b)} AS eb,
             l_i * {_f(w_i)} AS ei,
             {eo_lit}        AS eo
      FROM lg),
    nmax AS MATERIALIZED (
      SELECT doc_id, tag, MAX(pos) AS last_pos, COUNT(*) AS n_pieces
      FROM em GROUP BY 1, 2),
    fwd AS (
      -- anchor: START + emission (no transition into the first position)
      SELECT e.doc_id, e.tag, e.pos,
             ({sB}) + e.eb AS vb, ({sI}) + e.ei AS vi, ({sO}) + e.eo AS vo,
             0 AS bb, 0 AS bi, 0 AS bo
      FROM em e WHERE e.pos = 0
      UNION ALL
      SELECT f.doc_id, f.tag, e.pos,
             {s_vb}, {s_vi}, {s_vo},
             {s_bb}, {s_bi}, {s_bo}
      FROM fwd f
      JOIN em e ON e.doc_id = f.doc_id AND e.tag = f.tag
               AND e.pos = f.pos + 1),
    fwdm AS MATERIALIZED (SELECT * FROM fwd),
    sel AS (
      SELECT f.doc_id, f.tag, n.last_pos,
             CASE WHEN f.vb + ({eB}) >= f.vi + ({eI})
                   AND f.vb + ({eB}) >= f.vo + ({eO}) THEN 0
                  WHEN f.vi + ({eI}) >= f.vo + ({eO}) THEN 1 ELSE 2 END AS st
      FROM fwdm f
      JOIN nmax n ON n.doc_id = f.doc_id AND n.tag = f.tag
                 AND f.pos = n.last_pos),
    bt AS (
      SELECT doc_id, tag, last_pos AS pos, st FROM sel
      UNION ALL
      SELECT b.doc_id, b.tag, b.pos - 1,
             CASE b.st WHEN 0 THEN f.bb WHEN 1 THEN f.bi ELSE f.bo END
      FROM bt b
      JOIN fwdm f ON f.doc_id = b.doc_id AND f.tag = b.tag AND f.pos = b.pos
      WHERE b.pos > 0),
    btm AS MATERIALIZED (SELECT * FROM bt),
    -- path score: START + END + sum(emissions at path) + sum(transitions)
    emsum AS (
      SELECT b.doc_id, b.tag,
             SUM(CASE b.st WHEN 0 THEN e.eb WHEN 1 THEN e.ei ELSE e.eo END) AS s_em
      FROM btm b
      JOIN em e ON e.doc_id = b.doc_id AND e.tag = b.tag AND e.pos = b.pos
      GROUP BY 1, 2),
    trsum AS (
      SELECT p.doc_id, p.tag,
             COALESCE(SUM({trans_case}), 0.0) AS s_tr
      FROM btm p
      JOIN btm c ON c.doc_id = p.doc_id AND c.tag = p.tag
                AND c.pos = p.pos + 1
      GROUP BY 1, 2),
    ends AS (
      SELECT f.doc_id, f.tag,
             CASE f0.st WHEN 0 THEN {sB} WHEN 1 THEN {sI} ELSE {sO} END AS s_start,
             CASE f.st  WHEN 0 THEN {eB} WHEN 1 THEN {eI} ELSE {eO} END AS s_end
      FROM sel s
      JOIN btm f  ON f.doc_id = s.doc_id AND f.tag = s.tag AND f.pos = s.last_pos
      JOIN btm f0 ON f0.doc_id = s.doc_id AND f0.tag = s.tag AND f0.pos = 0),
    -- log-partition: sum-product forward, per-step max shift like the kernel
    zf AS (
      SELECT e.doc_id, e.tag, e.pos,
             ({sB}) + e.eb AS zb, ({sI}) + e.ei AS zi, ({sO}) + e.eo AS zo
      FROM em e WHERE e.pos = 0
      UNION ALL
      SELECT f.doc_id, f.tag, e.pos, {z_b}, {z_i}, {z_o}
      FROM zf f
      JOIN em e ON e.doc_id = f.doc_id AND e.tag = f.tag
               AND e.pos = f.pos + 1),
    zfm AS MATERIALIZED (SELECT * FROM zf),
    logz AS (
      SELECT z.doc_id, z.tag,
             ln(exp(z.zb + ({eB}) - m) + exp(z.zi + ({eI}) - m)
                + exp(z.zo + ({eO}) - m)) + m AS log_z
      FROM zfm z
      JOIN nmax n ON n.doc_id = z.doc_id AND n.tag = z.tag
                 AND z.pos = n.last_pos
      CROSS JOIN LATERAL (
        SELECT GREATEST(z.zb + ({eB}), z.zi + ({eI}), z.zo + ({eO})) AS m) mm)
    SELECT n.doc_id, n.tag AS type, n.n_pieces::INTEGER AS n_pieces,
           FLOOR((d.s_start + d.s_end + es.s_em + COALESCE(tr.s_tr, 0.0) - lz.log_z) * 1000000 + 0.5) / 1000000 AS confidence
    FROM nmax n
    JOIN ends d   ON d.doc_id = n.doc_id AND d.tag = n.tag
    JOIN emsum es ON es.doc_id = n.doc_id AND es.tag = n.tag
    LEFT JOIN trsum tr ON tr.doc_id = n.doc_id AND tr.tag = n.tag
    JOIN logz lz  ON lz.doc_id = n.doc_id AND lz.tag = n.tag
    """
    )
    return base.replace("WITH corpus AS", "WITH RECURSIVE corpus AS", 1)
