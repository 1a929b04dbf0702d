"""ANSI-SQL (DuckDB) twin of the flagship battery mention-detection pipeline.

The deterministic QA scorer (kernel/scorer.py) hashes with md5-60bit
precisely so this twin exists: every stage of the flagship DAG —
tokenization (wordpiece.py::tokenize_text), fixed-width WordPiece split
(wp_split), per-query truncation (assemble, P5), query-conditioned 3-logit
emission with the previous-token interaction (DeterministicQAScorer.logits),
argmax with first-occurrence tie-break (top-1 == W3), head-keeps-label
WordPiece merge (P8), and the uniform-type IOB2 decode with transition
repair (decode_bio_uniform, W1) — is replayed here in plain SQL over the
same corpus CTE.  The driver's correctness gate therefore hash-checks the
whole scorer->decode pipeline externally, not just rows-only.

Float fidelity: every arithmetic step (``(h % 997)/997.0`` etc.) is written
in the same order as the NumPy kernel, so IEEE-754 doubles agree
bit-for-bit; ties between logits are impossible by construction (the
rationals ``k/997`` and ``m/991`` can never make the gains/biases collide),
so the CASE argmax is exact.

Scale note: this module is the *oracle*, not the engine — the engine path
is the Arrow-batched iterator UDF in operators/mention_detect.py.
"""

from __future__ import annotations

from ..kernel.scorer import DeterministicQAScorer as _S
from ..kernel.wordpiece import MAX_SEQ_LENGTH, PIECE, tokenize_text, wp_split_seq
from ..queries_battery import QUERIES

# tokenize_text as one regex: ASCII-alphanumeric runs kept whole, every
# other non-whitespace char is its own token (README.md:128 convention)
TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


def _battery_values() -> str:
    """(tag, qlen) rows: query sub-token lengths computed with the SAME
    kernel functions the engine uses (embedded as literals, like the
    priority CASE table)."""
    rows = []
    for tag, question in sorted(QUERIES.items()):
        qlen = len(wp_split_seq(tokenize_text(question)))
        rows.append(f"('{tag}', {qlen})")
    return ",\n        ".join(rows)


def _battery_prelude(
    corpus_sql: str,
    max_seq_length: int = MAX_SEQ_LENGTH,
    values_sql: str | None = None,
    carry_piece: bool = False,
) -> str:
    """Shared CTE chain corpus -> toks -> pieces -> tags -> scored -> lg
    (per-(doc, tag, pos) logits retained for downstream consumers).

    ``values_sql`` swaps the (tag, qlen) VALUES body (the trainer oracle
    restricts to TRAIN_TAGS); ``carry_piece`` additionally threads the raw
    piece string and its LAG predecessor (default '[SEP]') through scored
    and lg — the trainer's feature hashing needs both.  Default arguments
    reproduce the flagship prelude unchanged."""
    piece_col = "p.piece," if carry_piece else ""
    prev_col = (
        "LAG(piece, 1, '[SEP]') OVER w AS prev," if carry_piece else ""
    )
    return f"""
    WITH corpus AS ({corpus_sql}),
    toks AS (
      SELECT doc_id, (u.s).tok AS tok, (u.s).i - 1 AS tok_idx
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 regexp_extract_all(content, '{TOKEN_RE}'),
                 (x, i) -> {{'tok': x, 'i': i}})) AS s
        FROM corpus) u),
    pieces AS (
      SELECT doc_id, tok, tok_idx, k,
             CASE WHEN k = 0 THEN substr(tok, 1, {PIECE})
                  ELSE '##' || substr(tok, k * {PIECE} + 1, {PIECE})
             END AS piece,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tok_idx, k) - 1 AS pos
      FROM (SELECT doc_id, tok, tok_idx,
                   unnest(range((length(tok) + {PIECE} - 1) // {PIECE})) AS k
            FROM toks)),
    tags AS (
      SELECT tag, qlen,
             -- hot('[SEP]') under this tag: the previous-token state seen by
             -- the first passage piece (battery fast path scores [SEP] + P)
             (('0x' || substr(md5(tag || '|' || '[SEP]'), 1, 15))::BIGINT % 997) / 997.0 AS sep_u1,
             ((('0x' || substr(md5(tag || '|' || '[SEP]'), 1, 15))::BIGINT >> 10) % 991) / 991.0 AS sep_u2
      FROM (VALUES
        {values_sql or _battery_values()}) v(tag, qlen)),
    scored AS (
      SELECT p.doc_id, t.tag, p.tok, p.tok_idx, p.k, p.pos, {piece_col}
             (h % 997) / 997.0 AS u1,
             ((h >> 10) % 991) / 991.0 AS u2,
             (t.sep_u1 > 0.985 OR t.sep_u2 > 0.93) AS sep_hot
      FROM pieces p
      CROSS JOIN tags t
      CROSS JOIN LATERAL (SELECT ('0x' || substr(md5(t.tag || '|' || p.piece), 1, 15))::BIGINT AS h) hh
      WHERE p.pos < {max_seq_length} - t.qlen - 3),
    lg AS (
      SELECT *, {prev_col}
             {_S.B_GAIN} * u1 + ({_S.B_BIAS}) AS l_b,
             {_S.I_GAIN} * u2 + ({_S.I_BIAS})
               + {_S.I_PREV_BOOST} * (CASE WHEN COALESCE(
                     LAG(u1 > 0.985 OR u2 > 0.93) OVER w, sep_hot)
                   THEN 1.0 ELSE 0.0 END) AS l_i,
             {_S.O_BIAS} AS l_o
      FROM scored
      WINDOW w AS (PARTITION BY doc_id, tag ORDER BY pos))"""


def _span_decode_ctes(src: str) -> str:
    """CTE chain ``src`` -> merged -> starts -> runs -> m_spans: WordPiece
    merge (head keeps label) + uniform-type IOB2 decode with transition
    repair, over any relation with (doc_id, tag, tok, tok_idx, k, lab)
    columns — shared by the softmax (argmax) and CRF (Viterbi) twins."""
    return f""",
    merged AS (
      -- WordPiece merge: the head piece (k=0) keeps the label; the surface
      -- string is the prefix of the token covered by truncation-surviving
      -- pieces (merge(split(t)) == t when untruncated)
      SELECT doc_id, tag, tok_idx,
             MAX(CASE WHEN k = 0 THEN lab END) AS m_lab,
             substr(MIN(tok), 1, LEAST(length(MIN(tok)), {PIECE} * COUNT(*))) AS m_text
      FROM {src}
      GROUP BY doc_id, tag, tok_idx),
    starts AS (
      -- IOB2 decode (uniform type): start = B, or I whose predecessor is O
      -- (the scheme.py transition-repair rule)
      SELECT *,
             CASE WHEN m_lab = 'B'
                    OR (m_lab = 'I' AND COALESCE(LAG(m_lab) OVER w1, 'O') = 'O')
                  THEN 1 ELSE 0 END AS is_start
      FROM merged
      WINDOW w1 AS (PARTITION BY doc_id, tag ORDER BY tok_idx)),
    runs AS (
      -- islands by running start-count
      SELECT *,
             SUM(is_start) OVER (PARTITION BY doc_id, tag ORDER BY tok_idx
                                 ROWS UNBOUNDED PRECEDING) AS grp
      FROM starts),
    m_spans AS (
      SELECT doc_id, tag AS type,
             MIN(tok_idx)::INTEGER AS start_pos,
             MAX(tok_idx)::INTEGER AS end_pos,
             STRING_AGG(m_text, '' ORDER BY tok_idx) AS text
      FROM runs
      WHERE m_lab <> 'O'
      GROUP BY doc_id, tag, grp)"""


def _mention_span_ctes() -> str:
    """CTE chain lg -> labeled -> merged -> ... -> m_spans (the top-1 typed
    spans of the whole battery: softmax argmax labels + shared decode)."""
    return """,
    labeled AS (
      SELECT doc_id, tag, tok, tok_idx, k,
             CASE WHEN l_b >= l_i AND l_b >= l_o THEN 'B'
                  WHEN l_i >= l_o THEN 'I'
                  ELSE 'O' END AS lab
      FROM lg)""" + _span_decode_ctes("labeled")


def mentions_oracle_sql(corpus_sql: str,
                        max_seq_length: int = MAX_SEQ_LENGTH) -> str:
    """DuckDB SQL producing exactly ``detect_mentions(corpus(...))``'s
    (doc_id, type, start_pos, end_pos, text) rows."""
    return (
        _battery_prelude(corpus_sql, max_seq_length)
        + _mention_span_ctes()
        + "\n    SELECT doc_id, type, start_pos, end_pos, text FROM m_spans"
    )


def sl_typed_decode_tail() -> str:
    """Shared typed-label decode tail for the flat (SL / SL-CRF) twins:
    from a ``best`` CTE with (doc_id, tok, tok_idx, k, lp, typ) rows, merge
    wordpieces (head keeps label), run the GENERAL typed IOB2 automaton of
    kernel/iob2.py::decode_bio (scheme.py truth tables, incl. the
    begin-fallback-0 and sentinel quirks), and emit the final span rows."""
    return f""",
    merged AS (
      SELECT doc_id, tok_idx,
             MAX(CASE WHEN k = 0 THEN lp END) AS lp,
             MAX(CASE WHEN k = 0 THEN typ END) AS typ,
             substr(MIN(tok), 1, LEAST(length(MIN(tok)), {PIECE} * COUNT(*))) AS m_text
      FROM best
      GROUP BY doc_id, tok_idx),
    seq AS (
      SELECT doc_id, tok_idx, lp, typ, m_text FROM merged
      UNION ALL  -- decode sentinel ("", "O") (entity.py:52)
      SELECT doc_id, MAX(tok_idx) + 1, 'O', '', '' FROM merged GROUP BY doc_id),
    ext AS (
      SELECT *,
             LAG(lp, 1, 'O') OVER w AS prev_lp,
             LAG(typ, 1, '') OVER w AS prev_typ
      FROM seq
      WINDOW w AS (PARTITION BY doc_id ORDER BY tok_idx)),
    masked AS (
      SELECT *,
             (prev_lp IN ('B', 'I'))
               AND (lp = 'B' OR (lp IN ('I', 'O') AND prev_typ <> typ)) AS end_mask,
             (lp = 'B' AND (prev_lp IN ('B', 'I')
                            OR (prev_lp = 'O' AND prev_typ <> typ)))
               OR (lp = 'I' AND prev_typ <> typ) AS start_mask
      FROM ext),
    withbegin AS (
      SELECT *,
             COALESCE(MAX(CASE WHEN start_mask THEN tok_idx END) OVER
                        (PARTITION BY doc_id ORDER BY tok_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS begin_i
      FROM masked),
    spans AS (
      SELECT doc_id, begin_i, tok_idx - 1 AS end_i, prev_typ AS span_typ
      FROM withbegin WHERE end_mask)
    SELECT s.doc_id, s.span_typ AS type,
           s.begin_i::INTEGER AS start_pos,
           s.end_i::INTEGER AS end_pos,
           STRING_AGG(m.m_text, '' ORDER BY m.tok_idx) AS text
    FROM spans s
    JOIN merged m ON m.doc_id = s.doc_id
                 AND m.tok_idx BETWEEN s.begin_i AND s.end_i
    GROUP BY s.doc_id, s.span_typ, s.begin_i, s.end_i
    """


def _sl_types_values() -> str:
    """(type_idx, type) rows in the engine's label-space order
    (list(QUERIES.keys()) — argmax tie-break depends on this order)."""
    return ",\n        ".join(
        f"({i}, '{t}')" for i, t in enumerate(QUERIES.keys())
    )


def sl_mentions_oracle_sql(corpus_sql: str,
                           max_seq_length: int = MAX_SEQ_LENGTH) -> str:
    """DuckDB SQL producing exactly ``detect_mentions_sl(corpus(...))``'s
    (doc_id, type, start_pos, end_pos, text) rows — the flat 65-label
    model family (kernel/sl.py): one argmax over [O] + [B-t, I-t]*types,
    [CLS] P [SEP] assembly, head-keeps-label merge, and the GENERAL typed
    IOB2 automaton of kernel/iob2.py::decode_bio (scheme.py truth tables,
    including the begin-fallback-0 and B-after-O-same-type quirks)."""
    return sl_best_prelude(corpus_sql, max_seq_length) + sl_typed_decode_tail()


def sl_token_labels_ctes(corpus_sql: str,
                         max_seq_length: int = MAX_SEQ_LENGTH) -> str:
    """CTE chain ending in ``pred(pid, pos, label)``: the SL model's merged
    per-token label stream (head keeps label, [CLS]/[SEP] stripped) — the
    y_pred of the reference's token-level metrics (eval.py:39-47,
    metrics_sl.py:243-270).  Same prelude as the span twin; the decode
    automaton is simply not applied."""
    return sl_best_prelude(corpus_sql, max_seq_length) + """,
    merged AS (
      SELECT doc_id, tok_idx,
             MAX(CASE WHEN k = 0 THEN lp END) AS lp,
             MAX(CASE WHEN k = 0 THEN typ END) AS typ
      FROM best
      GROUP BY doc_id, tok_idx),
    pred AS (
      SELECT doc_id AS pid, tok_idx AS pos,
             CASE WHEN lp = 'O' THEN 'O' ELSE lp || '-' || typ END AS label
      FROM merged)"""


def sl_best_prelude(corpus_sql: str,
                    max_seq_length: int = MAX_SEQ_LENGTH) -> str:
    """Shared SL-twin prelude: corpus -> tokens -> wordpieces -> 65-label
    logits -> per-piece argmax (``best``).  Consumed by the span twin
    (+ decode tail) and the token-label twin (+ merge only)."""
    limit = max_seq_length - 2
    g, bb = _S.B_GAIN, _S.B_BIAS
    ig, ib, pb = _S.I_GAIN, _S.I_BIAS, _S.I_PREV_BOOST
    ob = _S.O_BIAS
    return f"""
    WITH corpus AS ({corpus_sql}),
    toks AS (
      SELECT doc_id, (u.s).tok AS tok, (u.s).i - 1 AS tok_idx
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 regexp_extract_all(content, '{TOKEN_RE}'),
                 (x, i) -> {{'tok': x, 'i': i}})) AS s
        FROM corpus) u),
    pieces AS (
      SELECT doc_id, tok, tok_idx, k,
             CASE WHEN k = 0 THEN substr(tok, 1, {PIECE})
                  ELSE '##' || substr(tok, k * {PIECE} + 1, {PIECE})
             END AS piece,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tok_idx, k) - 1 AS pos
      FROM (SELECT doc_id, tok, tok_idx,
                   unnest(range((length(tok) + {PIECE} - 1) // {PIECE})) AS k
            FROM toks)),
    types AS (
      SELECT ti, typ,
             (('0x' || substr(md5(typ || '|' || '[CLS]'), 1, 15))::BIGINT % 997) / 997.0 AS cls_u1,
             ((('0x' || substr(md5(typ || '|' || '[CLS]'), 1, 15))::BIGINT >> 10) % 991) / 991.0 AS cls_u2
      FROM (VALUES
        {_sl_types_values()}) v(ti, typ)),
    scoredt AS (
      SELECT p.doc_id, p.tok, p.tok_idx, p.k, p.pos, t.ti, t.typ,
             (h % 997) / 997.0 AS u1,
             ((h >> 10) % 991) / 991.0 AS u2,
             (t.cls_u1 > 0.985 OR t.cls_u2 > 0.93) AS cls_hot
      FROM pieces p
      CROSS JOIN types t
      CROSS JOIN LATERAL (SELECT ('0x' || substr(md5(t.typ || '|' || p.piece), 1, 15))::BIGINT AS h) hh
      WHERE p.pos < {limit}),
    logits AS (
      SELECT *,
             {g} * u1 + ({bb}) AS l_b,
             {ig} * u2 + ({ib})
               + {pb} * (CASE WHEN COALESCE(
                     LAG(u1 > 0.985 OR u2 > 0.93) OVER
                       (PARTITION BY doc_id, ti ORDER BY pos), cls_hot)
                   THEN 1.0 ELSE 0.0 END) AS l_i
      FROM scoredt),
    cand AS (
      SELECT doc_id, tok, tok_idx, k, pos, 1 + 2 * ti AS label_idx,
             l_b AS logit, 'B' AS lp, typ FROM logits
      UNION ALL
      SELECT doc_id, tok, tok_idx, k, pos, 2 + 2 * ti, l_i, 'I', typ FROM logits
      UNION ALL
      SELECT DISTINCT doc_id, tok, tok_idx, k, pos, 0, {ob}, 'O', '' FROM logits),
    best AS (
      SELECT doc_id, tok, tok_idx, k, lp, typ FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, pos
                                     ORDER BY logit DESC, label_idx ASC) AS rn
        FROM cand) WHERE rn = 1)"""


def _featurize_battery_values() -> str:
    """(tag, qlen, q_ids) literal rows — query-side features precomputed
    with the same kernel (token_id / wp_split / tokenize_text)."""
    from ..kernel.features import token_id

    rows = []
    for tag, question in sorted(QUERIES.items()):
        q_sub = wp_split_seq(tokenize_text(question))
        ids = ", ".join(str(token_id(t)) for t in q_sub)
        rows.append(f"('{tag}', {len(q_sub)}, [{ids}])")
    return ",\n        ".join(rows)


def featurize_oracle_sql(gold_prelude: str, max_seq_length: int = 128) -> str:
    """DuckDB SQL twin of ``featurize_corpus(corpus, gold_spans=gold, 128)``:
    P1-P6 (QASL label painting, wordpiece alignment with -100 continuations,
    [CLS] Q [SEP] P [SEP] assembly, truncation, padding + masks) as list
    expressions.  ``gold_prelude`` must open WITH corpus/toks/gold CTEs
    (operators/gold.py::gold_mentions_sql)."""
    from ..kernel.features import (
        CLS_ID,
        PAD_TOKEN_LABEL_ID,
        SEP_ID,
        VOCAB_OFFSET,
        VOCAB_SIZE,
    )

    m = max_seq_length
    pad = PAD_TOKEN_LABEL_ID
    return (
        gold_prelude.rstrip()
        + f""",
    ftoks AS (
      SELECT doc_id, (u.s).tok AS tok, (u.s).i - 1 AS tok_idx
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 regexp_extract_all(content, '{TOKEN_RE}'),
                 (x, i) -> {{'tok': x, 'i': i}})) AS s
        FROM corpus) u),
    fpieces AS (
      SELECT doc_id, tok, tok_idx, k,
             CASE WHEN k = 0 THEN substr(tok, 1, {PIECE})
                  ELSE '##' || substr(tok, k * {PIECE} + 1, {PIECE})
             END AS piece,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tok_idx, k) - 1 AS pos
      FROM (SELECT doc_id, tok, tok_idx,
                   unnest(range((length(tok) + {PIECE} - 1) // {PIECE})) AS k
            FROM ftoks)),
    fbattery AS (
      SELECT * FROM (VALUES
        {_featurize_battery_values()}) v(tag, qlen, q_ids)),
    painted AS (
      -- QASL painting (P2): deterministic last-write = max (start, end)
      -- covering span of the query's type; B if it starts here, else I
      SELECT doc_id, tag, tok_idx, lab_id FROM (
        SELECT t.doc_id, g.type AS tag, t.tok_idx,
               CASE WHEN g.start_pos = t.tok_idx THEN 1 ELSE 2 END AS lab_id,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id, g.type, t.tok_idx
                                  ORDER BY g.start_pos DESC, g.end_pos DESC) AS rn
        FROM ftoks t
        JOIN gold g ON g.pid = t.doc_id
                   AND t.tok_idx BETWEEN g.start_pos AND g.end_pos)
      WHERE rn = 1),
    prows AS (
      SELECT p.doc_id, b.tag, b.qlen, b.q_ids, p.pos,
             {VOCAB_OFFSET} + (('0x' || substr(md5('vocab|' || p.piece), 1, 15))::BIGINT % {VOCAB_SIZE}) AS piece_id,
             CASE WHEN p.k = 0 THEN COALESCE(pl.lab_id, 0) ELSE {pad} END AS lab
      FROM fpieces p
      CROSS JOIN fbattery b
      LEFT JOIN painted pl ON pl.doc_id = p.doc_id
                          AND pl.tok_idx = p.tok_idx AND pl.tag = b.tag
      WHERE p.pos < {m} - b.qlen - 3),
    fagg AS (
      SELECT doc_id, tag,
             list(piece_id ORDER BY pos) AS p_ids,
             list(lab ORDER BY pos)      AS p_labs,
             COUNT(*)                    AS n_p
      FROM prows GROUP BY doc_id, tag),
    -- every (doc x query) emits a row, even when the document tokenizes to
    -- ZERO passage pieces (the engine pads those to [CLS] Q [SEP] [SEP]):
    -- build the frame from corpus x battery and left-join the piece aggs
    frows AS (
      SELECT c.doc_id, b.tag, b.qlen, b.q_ids,
             COALESCE(f.p_ids, CAST([] AS BIGINT[]))   AS p_ids,
             COALESCE(f.p_labs, CAST([] AS INTEGER[])) AS p_labs,
             COALESCE(f.n_p, 0)     AS n_p
      FROM (SELECT doc_id FROM corpus) c
      CROSS JOIN fbattery b
      LEFT JOIN fagg f ON f.doc_id = c.doc_id AND f.tag = b.tag)
    SELECT doc_id, tag AS q_tag,
           [{CLS_ID}] || q_ids || [{SEP_ID}] || p_ids || [{SEP_ID}]
             || list_transform(range({m} - qlen - 3 - n_p), x -> 0) AS input_ids,
           list_transform(range(qlen + 3 + n_p), x -> 1)
             || list_transform(range({m} - qlen - 3 - n_p), x -> 0) AS attention_mask,
           list_transform(range(qlen + 2), x -> 0)
             || list_transform(range(n_p + 1), x -> 1)
             || list_transform(range({m} - qlen - 3 - n_p), x -> 0) AS token_type_ids,
           list_transform(range(qlen + 2), x -> {pad}) || p_labs || [{pad}]
             || list_transform(range({m} - qlen - 3 - n_p), x -> {pad}) AS label_ids
    FROM frows
    """
    )


def augment_oracle_sql(corpus_sql: str, p_times: float = 1.1) -> str:
    """DuckDB twin of ``augment_corpus(corpus, p_times)`` (kernel/augment.py):
    top-1 battery spans unioned with top-2 "gotten-back" spans.

    The top-2 machinery is replayed exactly: second-best label by
    (prob desc, label-id asc) — computable from logits alone since softmax
    is monotone; softmax probabilities with the same ``exp(x - max) / sum``
    evaluation order; the three mean-probability gates against
    ``p_times * mean``; the faithful NaN quirk (empty interior -> AVG over
    zero rows -> NULL -> gate fails, like ``nan > thr`` in NumPy); and
    top1-wins dedup.  score_ratio is rounded to 6 digits on both sides
    (libm exp may differ from NumPy's SIMD exp by 1 ulp; every *decision*
    compares generically-separated doubles, so rounding only the emitted
    ratio is sufficient for exactness in practice)."""
    return (
        _battery_prelude(corpus_sql)
        + _mention_span_ctes()
        + f""",
    top2 AS (
      -- merged+stripped (head keeps top-2) second-best label char + prob
      SELECT doc_id, tag, tok_idx,
             CASE WHEN first = 'B' THEN (CASE WHEN l_i >= l_o THEN 'I' ELSE 'O' END)
                  WHEN first = 'I' THEN (CASE WHEN l_b >= l_o THEN 'B' ELSE 'O' END)
                  ELSE (CASE WHEN l_b >= l_i THEN 'B' ELSE 'I' END)
             END AS l2,
             exp((CASE WHEN first = 'B' THEN (CASE WHEN l_i >= l_o THEN l_i ELSE l_o END)
                       WHEN first = 'I' THEN (CASE WHEN l_b >= l_o THEN l_b ELSE l_o END)
                       ELSE (CASE WHEN l_b >= l_i THEN l_b ELSE l_i END)
                  END) - mx)
               / (exp(l_b - mx) + exp(l_i - mx) + exp(l_o - mx)) AS p2
      FROM (
        SELECT doc_id, tag, tok_idx, l_b, l_i, l_o,
               GREATEST(l_b, l_i, l_o) AS mx,
               CASE WHEN l_b >= l_i AND l_b >= l_o THEN 'B'
                    WHEN l_i >= l_o THEN 'I'
                    ELSE 'O' END AS first
        FROM lg WHERE k = 0)),
    tagstats AS (
      SELECT doc_id, tag, COUNT(*) AS n_len, AVG(p2) AS mean
      FROM top2 GROUP BY doc_id, tag),
    dates AS (
      SELECT DISTINCT doc_id, start_pos AS s, end_pos AS e, text
      FROM m_spans
      WHERE type LIKE '%D' OR type LIKE '%S' OR type LIKE '%E'),
    cand AS (
      SELECT d.doc_id, ts.tag AS typ, d.s, d.e, d.text, ts.mean
      FROM dates d
      JOIN tagstats ts ON ts.doc_id = d.doc_id
      WHERE d.s < ts.n_len AND d.e < ts.n_len),
    gated AS (
      SELECT c.doc_id, c.typ, c.s, c.e, c.text, c.mean,
             BOOL_AND(CASE WHEN t.tok_idx = c.s THEN t.l2 = 'B'
                           ELSE t.l2 = 'I' END) AS shape_ok,
             MAX(CASE WHEN t.tok_idx = c.s THEN t.p2 END) AS p_start,
             AVG(CASE WHEN t.tok_idx > c.s THEN t.p2 END) AS interior_mean,
             AVG(t.p2) AS ent_mean
      FROM cand c
      JOIN top2 t ON t.doc_id = c.doc_id AND t.tag = c.typ
                 AND t.tok_idx BETWEEN c.s AND c.e
      GROUP BY c.doc_id, c.typ, c.s, c.e, c.text, c.mean),
    got_back AS (
      SELECT doc_id, typ AS type, s::INTEGER AS start_pos, e::INTEGER AS end_pos,
             text, 'top2' AS origin,
             ROUND(ent_mean / mean, 6) AS score_ratio
      FROM gated
      WHERE shape_ok
        AND p_start > mean * {p_times}
        AND interior_mean > mean * {p_times}
        AND ent_mean > mean * {p_times}),
    unioned AS (
      SELECT doc_id, type, start_pos, end_pos, text,
             'top1' AS origin, NULL::DOUBLE AS score_ratio
      FROM m_spans
      UNION ALL
      SELECT * FROM got_back)
    SELECT doc_id, type, start_pos, end_pos, text, origin, score_ratio
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, type, start_pos,
                                                end_pos, text
                                   ORDER BY origin ASC) AS rk
      FROM unioned)
    WHERE rk = 1
    """
    )


def _linking_ctes(corpus_sql: str, threshold: float = 0.5) -> str:
    """Shared DuckDB CTE chain for every linking-stage twin: battery
    mention detection -> surface MinHash/LSH -> Jaccard verify ->
    recursive-CTE connected components -> canonical election, ending at
    ``cmap (text, n_mentions, component, canonical_text)``.  Callers
    append their own final SELECT (plus optional CTEs with a leading
    comma) and must promote the opening WITH to WITH RECURSIVE.

    Every constant is imported from operators/linking.py so the two engines
    share one definition: md5-60bit surface ids and shingle hashes, the
    (a*x+b) mod 2^31-1 permutation family, b=16/r=2 banding with joined
    minhash-string band identities, the PAIR_CAP chain-pair skew guard, and
    the (n_mentions desc, text asc) total-order election."""
    from .linking import (
        LSH_BANDS,
        LSH_ROWS,
        MIN_BAND_HITS,
        MINHASH_K,
        PAIR_CAP,
        SHINGLE_N,
        _lh_coeffs,
        _P31,
    )

    coef_rows = ",\n        ".join(
        "({}, {}, {})".format(i, *_lh_coeffs(i)) for i in range(MINHASH_K)
    )
    base = (
        _battery_prelude(corpus_sql)
        + _mention_span_ctes()
        + f""",
    surfaces AS MATERIALIZED (
      SELECT text, COUNT(*) AS n_mentions,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS surface_id
      FROM m_spans GROUP BY text),
    padded AS (
      SELECT surface_id, text, n_mentions,
             CASE WHEN length(text) >= {SHINGLE_N} THEN text
                  ELSE text || repeat(chr(0), {SHINGLE_N} - length(text))
             END AS pt
      FROM surfaces),
    ssh AS (
      SELECT DISTINCT surface_id,
             ('0x' || substr(md5(substr(pt, i + 1, {SHINGLE_N})), 1, 15))::BIGINT AS h
      FROM (SELECT surface_id, pt,
                   unnest(range(length(pt) - {SHINGLE_N} + 1)) AS i
            FROM padded)),
    coef AS (SELECT * FROM (VALUES
        {coef_rows}) v(perm, a, b)),
    sig AS (
      SELECT surface_id, perm,
             MIN((a * (h % {_P31}) + b) % {_P31}) AS mh
      FROM ssh CROSS JOIN coef
      GROUP BY 1, 2),
    bandrows AS (
      SELECT surface_id, perm // {LSH_ROWS} AS band,
             -- packed BIGINT band identity (mh0 * 2^31 + mh1): the
             -- engine's band_frame arithmetic verbatim (r=2, mh < 2^31)
             SUM(mh * CASE WHEN perm % 2 = 0
                           THEN 2147483648 ELSE 1 END)::BIGINT AS band_sig
      FROM sig GROUP BY 1, 2),
    bsize AS (
      SELECT band, band_sig, COUNT(*) AS n
      FROM bandrows GROUP BY 1, 2),
    br AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY band, band_sig
                                   ORDER BY surface_id) AS rk
      FROM bandrows),
    pairsm AS (
      -- per-pair band-hit evidence: n_small = distinct small-bucket band
      -- collisions, chained = rode a capped bucket's connectivity chain
      SELECT a.surface_id AS src, b.surface_id AS dst,
             MAX(CASE WHEN s.n > {PAIR_CAP} THEN 1 ELSE 0 END) AS chained,
             SUM(CASE WHEN s.n <= {PAIR_CAP} THEN 1 ELSE 0 END) AS n_small
      FROM br a
      JOIN br b ON a.band = b.band AND a.band_sig = b.band_sig
      JOIN bsize s ON s.band = a.band AND s.band_sig = a.band_sig
      WHERE (s.n <= {PAIR_CAP} AND b.surface_id > a.surface_id)
         OR (s.n > {PAIR_CAP} AND b.rk = a.rk + 1)
      GROUP BY 1, 2),
    pairs AS (
      SELECT src, dst FROM pairsm
      WHERE chained = 1 OR n_small >= {MIN_BAND_HITS}),
    sizes AS (SELECT surface_id, COUNT(*) AS n_sh FROM ssh GROUP BY 1),
    inter AS (
      SELECT p.src, p.dst, COUNT(*) AS n_common
      FROM pairs p
      JOIN ssh a ON a.surface_id = p.src
      JOIN ssh b ON b.surface_id = p.dst AND b.h = a.h
      GROUP BY 1, 2),
    edges AS (
      SELECT src, dst
      FROM inter
      JOIN sizes sa ON sa.surface_id = src
      JOIN sizes sb ON sb.surface_id = dst
      WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {threshold}),
    -- MATERIALIZED: the recursive CTE below re-reads its inputs every
    -- iteration; without materialization DuckDB inlines (re-executes) the
    -- whole mention+linking chain per iteration
    ebi AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, comp) AS (
      SELECT surface_id, surface_id FROM surfaces
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN ebi e ON e.src = r.node),
    comps AS (SELECT node AS surface_id, MIN(comp) AS component
              FROM reach GROUP BY 1),
    slabeled AS (
      SELECT s.text, s.n_mentions,
             COALESCE(c.component, s.surface_id) AS component
      FROM surfaces s LEFT JOIN comps c USING (surface_id)),
    canon AS (
      SELECT component, text AS canonical_text FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY component
                                     ORDER BY n_mentions DESC, text ASC) AS rk
        FROM slabeled) WHERE rk = 1),
    cmap AS (
      SELECT l.text, l.n_mentions, l.component, c.canonical_text
      FROM slabeled l JOIN canon c USING (component))"""
    )
    return base


def canonical_triples_oracle_sql(corpus_sql: str, threshold: float = 0.5) -> str:
    """DuckDB twin of the ENTIRE KG pipeline (see :func:`_linking_ctes`)
    materialized as (subj, pred, obj, surface) triples."""
    base = _linking_ctes(corpus_sql, threshold) + """
    SELECT 'doc:' || CAST(m.doc_id AS VARCHAR) AS subj,
           'hasEntityType:' || m.type          AS pred,
           COALESCE(c.canonical_text, m.text)  AS obj,
           m.text                              AS surface
    FROM m_spans m LEFT JOIN cmap c ON c.text = m.text
    """
    # the recursive reach CTE requires the RECURSIVE keyword on the WITH
    return base.replace("WITH corpus AS", "WITH RECURSIVE corpus AS", 1)


def alias_dictionary_oracle_sql(corpus_sql: str, threshold: float = 0.5) -> str:
    """DuckDB twin of the alias dictionary: every multi-surface canonical
    cluster expanded to (canonical, alias, n_mentions, n_aliases,
    is_canonical) rows over the shared linking CTE chain."""
    base = _linking_ctes(corpus_sql, threshold) + """,
    csize AS (
      SELECT component, COUNT(*)::BIGINT AS n_aliases
      FROM cmap GROUP BY component)
    SELECT c.canonical_text AS canonical, c.text AS alias,
           c.n_mentions, s.n_aliases,
           (c.text = c.canonical_text) AS is_canonical
    FROM cmap c JOIN csize s USING (component)
    WHERE s.n_aliases >= 2
    """
    return base.replace("WITH corpus AS", "WITH RECURSIVE corpus AS", 1)


def minhash_dedup_oracle_sql(threshold: float = 0.6) -> str:
    """DuckDB twin of ``minhash_lsh_dedup(documents, threshold)``: the
    linking LSH stack keyed by document text — char-shingle MinHash,
    b=16/r=2 banding, chain-pair skew guard, exact Jaccard verify, and
    recursive-CTE connected components.  Output: (doc_id, component)."""
    from .linking import (
        LSH_BANDS,
        LSH_ROWS,
        MIN_BAND_HITS,
        MINHASH_K,
        PAIR_CAP,
        SHINGLE_N,
        _lh_coeffs,
        _P31,
    )

    coef_rows = ",\n        ".join(
        "({}, {}, {})".format(i, *_lh_coeffs(i)) for i in range(MINHASH_K)
    )
    return f"""
    WITH RECURSIVE surfaces AS MATERIALIZED (
      SELECT text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS surface_id
      FROM (SELECT DISTINCT text FROM documents)),
    padded AS (
      SELECT surface_id,
             CASE WHEN length(text) >= {SHINGLE_N} THEN text
                  ELSE text || repeat(chr(0), {SHINGLE_N} - length(text))
             END AS pt
      FROM surfaces),
    ssh AS (
      SELECT DISTINCT surface_id,
             ('0x' || substr(md5(substr(pt, i + 1, {SHINGLE_N})), 1, 15))::BIGINT AS h
      FROM (SELECT surface_id, pt,
                   unnest(range(length(pt) - {SHINGLE_N} + 1)) AS i
            FROM padded)),
    coef AS (SELECT * FROM (VALUES
        {coef_rows}) v(perm, a, b)),
    sig AS (
      SELECT surface_id, perm,
             MIN((a * (h % {_P31}) + b) % {_P31}) AS mh
      FROM ssh CROSS JOIN coef
      GROUP BY 1, 2),
    bandrows AS (
      SELECT surface_id, perm // {LSH_ROWS} AS band,
             -- packed BIGINT band identity (mh0 * 2^31 + mh1): the
             -- engine's band_frame arithmetic verbatim (r=2, mh < 2^31)
             SUM(mh * CASE WHEN perm % 2 = 0
                           THEN 2147483648 ELSE 1 END)::BIGINT AS band_sig
      FROM sig GROUP BY 1, 2),
    bsize AS (SELECT band, band_sig, COUNT(*) AS n FROM bandrows GROUP BY 1, 2),
    br AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY band, band_sig
                                   ORDER BY surface_id) AS rk
      FROM bandrows),
    pairsm AS (
      SELECT a.surface_id AS src, b.surface_id AS dst,
             MAX(CASE WHEN s.n > {PAIR_CAP} THEN 1 ELSE 0 END) AS chained,
             SUM(CASE WHEN s.n <= {PAIR_CAP} THEN 1 ELSE 0 END) AS n_small
      FROM br a
      JOIN br b ON a.band = b.band AND a.band_sig = b.band_sig
      JOIN bsize s ON s.band = a.band AND s.band_sig = a.band_sig
      WHERE (s.n <= {PAIR_CAP} AND b.surface_id > a.surface_id)
         OR (s.n > {PAIR_CAP} AND b.rk = a.rk + 1)
      GROUP BY 1, 2),
    pairs AS (
      SELECT src, dst FROM pairsm
      WHERE chained = 1 OR n_small >= {MIN_BAND_HITS}),
    sizes AS (SELECT surface_id, COUNT(*) AS n_sh FROM ssh GROUP BY 1),
    inter AS (
      SELECT p.src, p.dst, COUNT(*) AS n_common
      FROM pairs p
      JOIN ssh a ON a.surface_id = p.src
      JOIN ssh b ON b.surface_id = p.dst AND b.h = a.h
      GROUP BY 1, 2),
    edges AS (
      SELECT src, dst
      FROM inter
      JOIN sizes sa ON sa.surface_id = src
      JOIN sizes sb ON sb.surface_id = dst
      WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {threshold}),
    ebi AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, comp) AS (
      SELECT surface_id, surface_id FROM surfaces
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN ebi e ON e.src = r.node),
    comps AS (SELECT node AS surface_id, MIN(comp) AS component
              FROM reach GROUP BY 1)
    SELECT d.doc_id, COALESCE(c.component, s.surface_id) AS component
    FROM documents d
    JOIN surfaces s ON s.text = d.text
    LEFT JOIN comps c ON c.surface_id = s.surface_id
    """


def lsh_ann_oracle_sql(query_ids: list, k: int = 5) -> str:
    """DuckDB twin of ``lsh_ann_topk``: the 12x5 random-hyperplane LSH
    index replayed with the plane weights embedded as float64 literals
    (repr round-trips bit-exactly), sign-bit buckets, candidate equi-join,
    and exact cosine rerank.  Deterministic end to end — 'approximate'
    refers to recall vs brute force, not to reproducibility."""
    from .similarity import _N_PLANES, _N_TABLES, _PLANES

    rows = []
    for t in range(_N_TABLES):
        for p in range(_N_PLANES):
            for d in range(_PLANES[t].shape[1]):
                rows.append(f"({t},{p},{d},{_PLANES[t][p, d]!r})")
    planes_values = ",".join(rows)
    qids = ", ".join(map(str, query_ids))
    return f"""
    WITH planes AS MATERIALIZED (
      SELECT * FROM (VALUES {planes_values}) v(tbl, plane, dim, w)),
    ev AS (
      SELECT vec_id, (u.s).i - 1 AS dim, CAST((u.s).x AS DOUBLE) AS x
      FROM (SELECT vec_id,
                   unnest(list_transform(embedding, (x, i) -> {{'x': x, 'i': i}})) AS s
            FROM embeddings) u),
    dots AS (
      SELECT e.vec_id, p.tbl, p.plane, SUM(e.x * p.w) AS d
      FROM ev e JOIN planes p USING (dim)
      GROUP BY 1, 2, 3),
    buckets AS (
      SELECT vec_id, tbl,
             SUM(CASE WHEN d >= 0 THEN 1 << plane ELSE 0 END)::INT AS bucket
      FROM dots GROUP BY 1, 2),
    q AS (SELECT vec_id AS query_id, tbl, bucket FROM buckets
          WHERE vec_id IN ({qids})),
    cand AS (
      SELECT DISTINCT q.query_id, b.vec_id
      FROM buckets b JOIN q ON q.tbl = b.tbl AND q.bucket = b.bucket
      WHERE b.vec_id <> q.query_id),
    scored AS (
      SELECT c.query_id, c.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(qe.embedding AS DOUBLE[])) AS cos
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.vec_id
      JOIN embeddings qe ON qe.vec_id = c.query_id),
    ranked AS (
      SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id, ROUND(cos, 3) AS score
    FROM ranked WHERE rank <= {k}
    """


def incremental_dedup_oracle_sql(threshold: float = 0.6,
                                 batch_mod: int = 10) -> str:
    """DuckDB twin of ``dedup.incremental_dedup``: the same shingle/MinHash
    machinery as ``minhash_dedup_oracle_sql``, but with the asymmetric
    batch-vs-base band join, the base-side hot-bucket cap, exact Jaccard
    verify, and the (max jaccard, min base id) best-match election."""
    from .linking import (
        LSH_ROWS,
        MINHASH_K,
        PAIR_CAP,
        SHINGLE_N,
        _lh_coeffs,
        _P31,
    )

    coef_rows = ",\n        ".join(
        "({}, {}, {})".format(i, *_lh_coeffs(i)) for i in range(MINHASH_K)
    )
    return f"""
    WITH surfaces AS MATERIALIZED (
      SELECT text, ('0x' || substr(md5(text), 1, 15))::BIGINT AS surface_id
      FROM (SELECT DISTINCT text FROM documents)),
    padded AS (
      SELECT surface_id,
             CASE WHEN length(text) >= {SHINGLE_N} THEN text
                  ELSE text || repeat(chr(0), {SHINGLE_N} - length(text))
             END AS pt
      FROM surfaces),
    ssh AS (
      SELECT DISTINCT surface_id,
             ('0x' || substr(md5(substr(pt, i + 1, {SHINGLE_N})), 1, 15))::BIGINT AS h
      FROM (SELECT surface_id, pt,
                   unnest(range(length(pt) - {SHINGLE_N} + 1)) AS i
            FROM padded)),
    coef AS (SELECT * FROM (VALUES
        {coef_rows}) v(perm, a, b)),
    sig AS (
      SELECT surface_id, perm,
             MIN((a * (h % {_P31}) + b) % {_P31}) AS mh
      FROM ssh CROSS JOIN coef
      GROUP BY 1, 2),
    bandrows AS (
      SELECT surface_id, perm // {LSH_ROWS} AS band,
             -- packed BIGINT band identity (mh0 * 2^31 + mh1): the
             -- engine's band_frame arithmetic verbatim (r=2, mh < 2^31)
             SUM(mh * CASE WHEN perm % 2 = 0
                           THEN 2147483648 ELSE 1 END)::BIGINT AS band_sig
      FROM sig GROUP BY 1, 2),
    sdocs AS (
      SELECT d.doc_id, s.surface_id, d.doc_id % {batch_mod} = 0 AS is_batch
      FROM documents d JOIN surfaces s ON s.text = d.text),
    batchb AS (
      SELECT DISTINCT br.surface_id AS src, br.band, br.band_sig
      FROM bandrows br
      WHERE br.surface_id IN
            (SELECT surface_id FROM sdocs WHERE is_batch)),
    baseb AS (
      SELECT DISTINCT br.surface_id AS dst, br.band, br.band_sig
      FROM bandrows br
      WHERE br.surface_id IN
            (SELECT surface_id FROM sdocs WHERE NOT is_batch)),
    hot AS (
      SELECT band, band_sig FROM baseb
      GROUP BY 1, 2 HAVING COUNT(*) > {PAIR_CAP}),
    cand AS (
      SELECT DISTINCT a.src, b.dst
      FROM batchb a
      JOIN baseb b ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = b.band
                          AND h.band_sig = b.band_sig)),
    sizes AS (SELECT surface_id, COUNT(*) AS n_sh FROM ssh GROUP BY 1),
    inter AS (
      SELECT p.src, p.dst, COUNT(*) AS n_common
      FROM cand p
      JOIN ssh a ON a.surface_id = p.src
      JOIN ssh b ON b.surface_id = p.dst AND b.h = a.h
      GROUP BY 1, 2),
    edges AS (
      SELECT src, dst,
             n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.surface_id = src
      JOIN sizes sb ON sb.surface_id = dst
      WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
            >= {threshold}),
    pairs AS (
      SELECT bd.doc_id AS batch_doc, sd.doc_id AS base_doc, e.jaccard
      FROM edges e
      JOIN sdocs bd ON bd.surface_id = e.src AND bd.is_batch
      JOIN sdocs sd ON sd.surface_id = e.dst AND NOT sd.is_batch),
    agg AS (
      SELECT batch_doc AS doc_id, COUNT(*)::BIGINT AS n_matches,
             MAX(jaccard) AS mj
      FROM pairs GROUP BY 1)
    SELECT a.doc_id, a.n_matches,
           MIN(p.base_doc) AS dup_of, a.mj AS jaccard
    FROM agg a
    JOIN pairs p ON p.batch_doc = a.doc_id AND p.jaccard = a.mj
    GROUP BY a.doc_id, a.n_matches, a.mj
    """
