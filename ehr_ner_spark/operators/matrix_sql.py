"""DuckDB twin of the 4-model comparison matrix (A6,
/root/reference/results/evaluate.py:160-197): every model family's span set
scored against the flat and nested answer sets with micro P/R/F1.

Each model's span set is the FULL oracle pipeline of that family embedded
as a subquery (softmax battery, flat SL argmax, and the two CRF recursions)
— so one hash check covers all four decode paths side by side.  The answer
sets are the QASL battery output (nested) and its priority flat projection
(the reference's `flat_ne_answers` / `nested_ne_answers` stand-ins: the
sandbox has no human annotation, and kg_sl_vs_qasl already uses QASL as the
comparison anchor).  DIN is excluded on every side (P9, asserts.py:13-19).
"""

from __future__ import annotations

from ..queries_battery import PRIORITY
from .crf_sql import mentions_crf_oracle_sql
from .mention_sql import mentions_oracle_sql, sl_mentions_oracle_sql
from .sl_crf_sql import sl_crf_oracle_sql

SPAN_COLS = "pid, type, start_pos, end_pos, text"


def _prio_case() -> str:
    whens = " ".join(f"WHEN '{t}' THEN {p}" for t, p in PRIORITY.items())
    return f"CASE type {whens} ELSE -1.0 END"


def _micro_row(model: str, answers: str, m: str, a: str) -> str:
    """One matrix row: micro counts + P/R/F1 of model set ``m`` vs answer
    set ``a`` (both already deduped CTEs) — the metrics.py::micro_prf twin."""
    pr = "CASE WHEN p > 0 THEN c / CAST(p AS DOUBLE) ELSE 0 END"
    rc = "CASE WHEN t > 0 THEN c / CAST(t AS DOUBLE) ELSE 0 END"
    return f"""
    SELECT '{model}' AS model, '{answers}' AS answers,
           c AS nb_correct, p AS nb_pred, t AS nb_true,
           ROUND({pr}, 6) AS precision,
           ROUND({rc}, 6) AS recall,
           ROUND(CASE WHEN ({pr}) + ({rc}) > 0
                 THEN 2 * ({pr}) * ({rc}) / (({pr}) + ({rc}))
                 ELSE 0 END, 6) AS f1
    FROM (SELECT
            (SELECT COUNT(*) FROM (SELECT * FROM {m} INTERSECT SELECT * FROM {a})) AS c,
            (SELECT COUNT(*) FROM {m}) AS p,
            (SELECT COUNT(*) FROM {a}) AS t)"""


def model_matrix_oracle_sql(corpus_sql: str, max_seq_length: int = 128) -> str:
    models = {
        "bert_sl": sl_mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_sl": sl_crf_oracle_sql(corpus_sql, max_seq_length),
        "bert_qasl": mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_qasl": mentions_crf_oracle_sql(corpus_sql, max_seq_length),
    }
    sets = ",\n".join(
        f"""m_{name} AS MATERIALIZED (
      SELECT DISTINCT doc_id AS pid, type, start_pos, end_pos, text
      FROM ({sql})
      WHERE type <> 'DIN')"""
        for name, sql in models.items()
    )
    rows = "\n    UNION ALL".join(
        _micro_row(name, aname, f"m_{name}", f"a_{aname}")
        for name in models
        for aname in ("flat", "nested")
    )
    return f"""
    WITH RECURSIVE
    {sets},
    a_nested AS (SELECT * FROM m_bert_qasl),
    prioranked AS (
      SELECT {SPAN_COLS},
             ROW_NUMBER() OVER (PARTITION BY pid, start_pos, end_pos
                                ORDER BY {_prio_case()} DESC, type ASC) AS rk
      FROM m_bert_qasl),
    a_flat AS (SELECT {SPAN_COLS} FROM prioranked WHERE rk = 1)
    {rows}
    """


ENSEMBLE_MIN_VOTES = 2


def ensemble_oracle_sql(corpus_sql: str, max_seq_length: int = 128,
                        min_votes: int = ENSEMBLE_MIN_VOTES) -> str:
    """DuckDB twin of the 4-model majority-vote ensemble: the same four
    DISTINCT span sets as the comparison matrix, unioned with one vote per
    model, kept when >= ``min_votes`` models agree on the exact
    (pid, type, start, end, text) span."""
    models = {
        "bert_sl": sl_mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_sl": sl_crf_oracle_sql(corpus_sql, max_seq_length),
        "bert_qasl": mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_qasl": mentions_crf_oracle_sql(corpus_sql, max_seq_length),
    }
    sets = ",\n".join(
        f"""m_{name} AS MATERIALIZED (
      SELECT DISTINCT doc_id AS pid, type, start_pos, end_pos, text
      FROM ({sql})
      WHERE type <> 'DIN')"""
        for name, sql in models.items()
    )
    union = "\n      UNION ALL ".join(
        f"SELECT {SPAN_COLS} FROM m_{name}" for name in models
    )
    return f"""
    WITH RECURSIVE
    {sets}
    SELECT pid, type, start_pos, end_pos, text, COUNT(*)::BIGINT AS votes
    FROM ({union})
    GROUP BY pid, type, start_pos, end_pos, text
    HAVING COUNT(*) >= {min_votes}
    """


def agreement_oracle_sql(corpus_sql: str, max_seq_length: int = 128) -> str:
    """DuckDB twin of the pairwise inter-model agreement matrix: the same
    four DISTINCT span sets as the comparison matrix, every unordered model
    pair scored with exact-span intersection size and integer micro-Jaccard
    ((1e6 * |A inter B|) // |A union B|) — the annotator-agreement view of
    the model zoo (evaluate.py compares each model to answers; this compares
    the models to EACH OTHER, the ensemble-diversity audit)."""
    models = {
        "bert_sl": sl_mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_sl": sl_crf_oracle_sql(corpus_sql, max_seq_length),
        "bert_qasl": mentions_oracle_sql(corpus_sql, max_seq_length),
        "bertbilstmcrf_qasl": mentions_crf_oracle_sql(corpus_sql, max_seq_length),
    }
    sets = ",\n".join(
        f"""m_{name} AS MATERIALIZED (
      SELECT DISTINCT doc_id AS pid, type, start_pos, end_pos, text
      FROM ({sql})
      WHERE type <> 'DIN')"""
        for name, sql in models.items()
    )
    union = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS model, {SPAN_COLS} FROM m_{name}" for name in models
    )
    return f"""
    WITH RECURSIVE
    {sets},
    u AS MATERIALIZED ({union}),
    sizes AS (SELECT model, COUNT(*)::BIGINT AS n FROM u GROUP BY model),
    inter AS (
      SELECT a.model AS model_a, b.model AS model_b, COUNT(*)::BIGINT AS n_inter
      FROM u a JOIN u b
        ON a.pid = b.pid AND a.type = b.type
       AND a.start_pos = b.start_pos AND a.end_pos = b.end_pos
       AND a.text = b.text AND a.model < b.model
      GROUP BY 1, 2)
    SELECT sa.model AS model_a, sb.model AS model_b,
           sa.n AS n_a, sb.n AS n_b,
           COALESCE(i.n_inter, 0)::BIGINT AS n_inter,
           ((1000000 * COALESCE(i.n_inter, 0))
              // (sa.n + sb.n - COALESCE(i.n_inter, 0))) AS jaccard_micro
    FROM sizes sa JOIN sizes sb ON sa.model < sb.model
    LEFT JOIN inter i ON i.model_a = sa.model AND i.model_b = sb.model
    """
