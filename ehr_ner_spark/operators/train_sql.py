"""ANSI-SQL (DuckDB) twin of the U7 distributed training loop.

A gradient-descent trainer has no natural SQL twin — but the class-weighted
batch perceptron (kernel/train.py) does, because every epoch is (a) a
deterministic argmax over weights that are an exact integer-count
expression and (b) a grouped integer aggregation.  This module UNROLLS the
epochs as a CTE chain:

    train                    -- teacher labels + hashed features (bit-exact
                                with the engine: same md5-60 discipline,
                                same float emission expressions as the
                                battery prelude in operators/mention_sql.py)
    wide0 (empty)            -- W = 0
    p{e} -> q{e} -> m{e}     -- logits, argmax (B<I<O tie-break), mistakes
    d{e} -> acc{e} -> wide{e}-- update counts, accumulate, derive weights

and emits the same all-integer (epoch, mistakes, correct, total) rows the
engine's ``train_metrics`` returns.  Because updates are integers and the
weight expression ``0.11*a0 + 1.0*a1 + 0.16*a2`` is evaluated in the same
IEEE order on both sides, the driver's hash check is exact — a TRAINING
LOOP with a full external oracle, not a rows-only row.

Scale note: this module is the oracle, not the engine — the engine path
(operators/train.py) is one staged scan plus per-epoch broadcast joins.
"""

from __future__ import annotations

from ..hashing import MD5_60_SQL
from ..kernel.scorer import CLASS_WEIGHTS
from ..kernel.train import TRAIN_DIM
from .mention_sql import _battery_prelude
from .train import TRAIN_TAGS, tags_qlen


def _md(x: str) -> str:
    return MD5_60_SQL.format(x=x)


def _train_ctes(
    corpus_sql: str,
    tags=TRAIN_TAGS,
    max_seq_length: int = 128,
    dim: int = TRAIN_DIM,
    epochs: int = 3,
) -> list:
    tq = tags_qlen(tuple(tags))
    values = ",\n        ".join(
        f"('{t}', {q})" for t, q in sorted(tq.items())
    )
    cw = [f"{float(c)!r}::DOUBLE" for c in CLASS_WEIGHTS]

    parts = [
        _battery_prelude(
            corpus_sql, max_seq_length, values_sql=values, carry_piece=True
        ),
        f""",
    train AS MATERIALIZED (
      SELECT CASE WHEN l_b >= l_i AND l_b >= l_o THEN 0
                  WHEN l_i >= l_o THEN 1 ELSE 2 END AS y,
             {_md("tag || '#u#' || piece")} % {dim} AS f_u,
             {_md("tag || '#b#' || prev || '#' || piece")} % {dim} AS f_b
      FROM lg),
    wide0 AS (
      SELECT CAST(NULL AS BIGINT) AS f, CAST(NULL AS DOUBLE) AS wB,
             CAST(NULL AS DOUBLE) AS wI, CAST(NULL AS DOUBLE) AS wO
      WHERE FALSE)""",
    ]

    for e in range(1, epochs + 2):  # epochs 1..E update; E+1 is eval-only
        parts.append(f""",
    p{e} AS (
      SELECT t.y, t.f_u, t.f_b,
             COALESCE(u.wB, 0.0) + COALESCE(b.wB, 0.0) AS lb,
             COALESCE(u.wI, 0.0) + COALESCE(b.wI, 0.0) AS li,
             COALESCE(u.wO, 0.0) + COALESCE(b.wO, 0.0) AS lo
      FROM train t
      LEFT JOIN wide{e - 1} u ON u.f = t.f_u
      LEFT JOIN wide{e - 1} b ON b.f = t.f_b),
    q{e} AS (
      SELECT *, CASE WHEN lb >= li AND lb >= lo THEN 0
                     WHEN li >= lo THEN 1 ELSE 2 END AS yhat
      FROM p{e}),
    m{e} AS MATERIALIZED (SELECT * FROM q{e} WHERE y <> yhat)""")
        if e <= epochs:
            acc_src = (
                f"d{e}" if e == 1
                else f"(SELECT * FROM acc{e - 1} UNION ALL SELECT * FROM d{e})"
            )
            parts.append(f""",
    d{e} AS (
      SELECT f, l, k, SUM(d)::BIGINT AS a FROM (
        SELECT f_u AS f, y AS l, y AS k, 1 AS d FROM m{e}
        UNION ALL SELECT f_u, yhat, y, -1 FROM m{e}
        UNION ALL SELECT f_b, y, y, 1 FROM m{e}
        UNION ALL SELECT f_b, yhat, y, -1 FROM m{e})
      GROUP BY f, l, k),
    acc{e} AS MATERIALIZED (
      SELECT f, l, k, SUM(a)::BIGINT AS a FROM {acc_src} GROUP BY f, l, k),
    wl{e} AS (
      SELECT f, l,
             {cw[0]} * SUM(CASE WHEN k = 0 THEN a ELSE 0 END)
           + {cw[1]} * SUM(CASE WHEN k = 1 THEN a ELSE 0 END)
           + {cw[2]} * SUM(CASE WHEN k = 2 THEN a ELSE 0 END) AS w
      FROM acc{e} GROUP BY f, l),
    wide{e} AS MATERIALIZED (
      SELECT f,
             COALESCE(SUM(CASE WHEN l = 0 THEN w END), 0.0) AS wB,
             COALESCE(SUM(CASE WHEN l = 1 THEN w END), 0.0) AS wI,
             COALESCE(SUM(CASE WHEN l = 2 THEN w END), 0.0) AS wO
      FROM wl{e} GROUP BY f)""")

    return parts


def train_oracle_sql(
    corpus_sql: str,
    tags=TRAIN_TAGS,
    max_seq_length: int = 128,
    dim: int = TRAIN_DIM,
    epochs: int = 3,
) -> str:
    parts = _train_ctes(corpus_sql, tags, max_seq_length, dim, epochs)
    out_rows = "\n      UNION ALL\n      ".join(
        f"SELECT {e} AS epoch, (SELECT COUNT(*) FROM m{e}) AS mistakes"
        for e in range(1, epochs + 2)
    )
    parts.append(f"""
    SELECT o.epoch, o.mistakes,
           tt.total - o.mistakes AS correct, tt.total
    FROM ({out_rows}) o
    CROSS JOIN (SELECT COUNT(*) AS total FROM train) tt""")
    return "".join(parts)


def trained_mentions_oracle_sql(
    corpus_sql: str,
    tags=TRAIN_TAGS,
    max_seq_length: int = 128,
    dim: int = TRAIN_DIM,
    epochs: int = 3,
) -> str:
    """The train -> deploy hand-off as ONE DuckDB query: run the unrolled
    training chain to its final weights (wide{epochs}), score every passage
    piece with the STUDENT (W[f_u] + W[f_b], argmax with the B<I<O
    tie-break), then decode spans through the same WordPiece-merge + IOB2
    CTEs the flagship oracle uses (mention_sql._span_decode_ctes) — the SQL
    twin of ``detect_mentions(..., scorer_factory=TrainedPerceptronScorer)``.
    """
    from .mention_sql import _span_decode_ctes

    parts = _train_ctes(corpus_sql, tags, max_seq_length, dim, epochs)
    w = f"wide{epochs}"
    parts.append(f""",
    sfeat AS (
      SELECT doc_id, tag, tok, tok_idx, k,
             {_md("tag || '#u#' || piece")} % {dim} AS f_u,
             {_md("tag || '#b#' || prev || '#' || piece")} % {dim} AS f_b
      FROM lg),
    sp AS (
      SELECT s.doc_id, s.tag, s.tok, s.tok_idx, s.k,
             COALESCE(u.wB, 0.0) + COALESCE(b.wB, 0.0) AS lb,
             COALESCE(u.wI, 0.0) + COALESCE(b.wI, 0.0) AS li,
             COALESCE(u.wO, 0.0) + COALESCE(b.wO, 0.0) AS lo
      FROM sfeat s
      LEFT JOIN {w} u ON u.f = s.f_u
      LEFT JOIN {w} b ON b.f = s.f_b),
    labeled AS (
      SELECT doc_id, tag, tok, tok_idx, k,
             CASE WHEN lb >= li AND lb >= lo THEN 'B'
                  WHEN li >= lo THEN 'I'
                  ELSE 'O' END AS lab
      FROM sp)""" + _span_decode_ctes("labeled") + """
    SELECT doc_id, type, start_pos, end_pos, text FROM m_spans""")
    return "".join(parts)
