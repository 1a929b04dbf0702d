"""Deterministic token-class "gold annotator" — a SQL-expressible mention
extractor used to exercise the span algebra (D1/D2/D4/D5, J2, A1/A2) under
the driver's DuckDB oracle gate (the hash-scorer path is checked by pytest
parity instead, since a BERT forward pass has no SQL twin).

Semantics mirror the reference's tag-file ingestion shape (S3: token + label
per position, /root/reference/data_process/dataTransformer.py:25-42): each
whitespace token whose surface matches a type's vocabulary becomes a
single-token span (start_pos = end_pos = token index).  Two type pairs share
surfaces on purpose so same-(start,end) collisions occur and D4 has real
work.  Token positions use the SAME whitespace split as the SQL oracle
(plain ``split(content, ' ')``) so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# type -> surface vocabulary (overlaps: 'scan' in T_SCAN & T_IO; 'merge' in
# T_JOIN & T_SORT) — collisions make the flat projection non-trivial.
GOLD_VOCAB: dict[str, tuple[str, ...]] = {
    "T_SCAN": ("scan", "table"),
    "T_IO": ("scan", "stream"),
    "T_JOIN": ("join", "merge"),
    "T_SORT": ("sort", "merge", "order"),
    "T_AGG": ("agg", "group"),
}

GOLD_PRIORITY: dict[str, float] = {
    "T_SCAN": 1.0, "T_IO": 2.0, "T_JOIN": 3.0, "T_SORT": 0.5, "T_AGG": 1.5,
}


def gold_mentions(corpus_df: DataFrame) -> DataFrame:
    """(doc_id, content) -> (pid, type, start_pos, end_pos, text) spans.

    ONE corpus scan: each token looks its type list up in a literal
    word -> array(type) map (11 keys) and explodes the hits — pure
    codegen, no join, and the overlap duplicates the old per-type union
    produced fall out of the array.  A union of per-type filters re-scans
    the corpus once per type — 5 scans here, |types| in general — which
    is the difference between one pass and sixteen over 100 TB."""
    by_word: dict[str, list[str]] = {}
    for typ, ws in GOLD_VOCAB.items():
        for w in ws:
            by_word.setdefault(w, []).append(typ)
    lookup = F.create_map(*[
        c
        for w, typs in sorted(by_word.items())
        for c in (F.lit(w), F.array(*[F.lit(t) for t in typs]))
    ])
    toks = corpus_df.select(
        F.col("doc_id").alias("pid"),
        F.posexplode(F.split(F.col("content"), " ")).alias("start_pos", "text"),
    )
    return (
        toks.select(
            "pid", "start_pos", "text",
            F.explode(F.coalesce(
                F.element_at(lookup, F.col("text")),
                F.array().cast("array<string>"),
            )).alias("type"),
        )
        .select(
            "pid",
            "type",
            "start_pos",
            F.col("start_pos").alias("end_pos"),
            "text",
        )
    )


def gold_mentions_sql(corpus_sql: str) -> str:
    """The DuckDB twin of :func:`gold_mentions` (zipped parallel unnest)."""
    unions = []
    for typ, vocab in GOLD_VOCAB.items():
        inlist = ", ".join(f"'{v}'" for v in vocab)
        unions.append(
            f"""SELECT pid, '{typ}' AS type, start_pos, start_pos AS end_pos, text
    FROM toks WHERE text IN ({inlist})"""
        )
    body = "\n  UNION ALL\n  ".join(unions)
    return f"""
WITH corpus AS ({corpus_sql}),
toks AS (
  SELECT doc_id AS pid,
         unnest(range(len(string_split(content, ' ')))) AS start_pos,
         unnest(string_split(content, ' '))             AS text
  FROM corpus
),
gold AS (
  {body}
)
"""
