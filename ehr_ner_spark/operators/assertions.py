"""Assertion (negation) detection over detected mentions — the classic
clinical-NLP post-NER step (NegEx, Chapman et al. 2001): a mention
preceded within a small token window by a negation cue is asserted
NEGATIVE ("denies chest pain"), everything else POSITIVE.  A KG that
materializes (doc, hasEntityType, entity) triples without assertion
status silently asserts every negated finding as present — this operator
is the guard.

The cue list here is a deterministic stand-in over the synthetic corpus
vocabulary (the mechanism — windowed lookback over the SAME whitespace
tokenization both engines share — is the real artifact; a clinical
deployment swaps CUE_TOKENS for the NegEx trigger lexicon).

Spark-first shape, 100-TB story: the naive formulation is a RANGE join
(mention.start - W <= cue.idx < mention.start), which Spark executes as
a broadcast nested loop.  Instead each cue token EXPLODES to the W
positions it influences (a map-side constant fan-out of |window|), so
the lookback becomes a plain (pid, position) EQUI-join — doc-keyed,
skew-free, and whole-stage codegen right up to the join.  All outputs
are strings/BIGINTs; no float discipline.

Reference contact: the reference emits raw span lists with no assertion
status (ner_api.py); this extends the mention-consumer family of
operators/priority.py using the gold annotator's span algebra
(operators/gold.py), which keeps the DuckDB twin exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUE_TOKENS = ("slow", "dup")
NEG_WINDOW = 3


def mention_assertions(corpus_df: DataFrame,
                       cues: tuple = CUE_TOKENS,
                       window: int = NEG_WINDOW) -> DataFrame:
    """corpus -> gold mentions + negated flag: 1 when a cue token occurs
    in the `window` tokens immediately before the mention start."""
    from .gold import gold_mentions

    g = gold_mentions(corpus_df)
    toks = corpus_df.select(
        F.col("doc_id").alias("pid"),
        F.posexplode(F.split(F.col("content"), " ")).alias("idx", "tok"),
    )
    influence = (
        toks.where(F.col("tok").isin(*cues))
        .select(
            "pid",
            F.explode(
                F.array(*[F.col("idx") + F.lit(o)
                          for o in range(1, window + 1)])
            ).alias("start_pos"),
        )
        .distinct()
        .withColumn("_neg", F.lit(1))
    )
    return g.join(influence, ["pid", "start_pos"], "left").select(
        "pid", "type",
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("end_pos").cast("long").alias("end_pos"),
        "text",
        F.coalesce(F.col("_neg"), F.lit(0)).cast("long").alias("negated"),
    )


def mention_assertions_sql(gold_prelude: str,
                           cues: tuple = CUE_TOKENS,
                           window: int = NEG_WINDOW) -> str:
    """DuckDB twin appended to the gold prelude (which defines the
    ``toks`` and ``gold`` CTEs over the identical whitespace split)."""
    inlist = ", ".join(f"'{c}'" for c in cues)
    offsets = ", ".join(f"start_pos + {o}" for o in range(1, window + 1))
    return gold_prelude.rstrip() + f""",
    influence AS (
      SELECT DISTINCT pid, start_pos FROM (
        SELECT pid, unnest([{offsets}]) AS start_pos
        FROM toks WHERE text IN ({inlist}))),
    flagged AS (
      SELECT g.pid, g.type, g.start_pos::BIGINT AS start_pos,
             g.end_pos::BIGINT AS end_pos, g.text,
             CASE WHEN i.pid IS NULL THEN 0 ELSE 1 END::BIGINT AS negated
      FROM gold g LEFT JOIN influence i
        ON i.pid = g.pid AND i.start_pos = g.start_pos)
    SELECT pid, type, start_pos, end_pos, text, negated FROM flagged
    """
