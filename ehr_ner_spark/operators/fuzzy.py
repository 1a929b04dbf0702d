"""Fuzzy alias candidates over the detected-mention surface vocabulary:
blocked edit-distance matching (levenshtein <= 2), the classic record-
linkage recall booster for typo'd / inflected aliases that the exact and
MinHash linkers miss at short lengths (a 1-char edit in a 4-char surface
is Jaccard-invisible but levenshtein-obvious).

Spark-first shape, 100-TB story: edit distance is quadratic per pair, so
the candidate space is cut by BLOCKING before any distance runs — each
surface registers under its own (first char, length) anchor key and
probes under (first char, length), (first char, length+1),
(first char, length+2); a pair whose lengths differ by <= 2 (a
levenshtein <= 2 necessity) shares at least one block, so blocking is
LOSSLESS for same-first-char pairs within the distance budget.  The join
is a plain equi-join on the block key; fan-out is bounded by the block
population (vocabulary per first-char x length cell — a language
constant, not a corpus variable), and the distance filter runs only on
candidates.  Differing-first-char pairs are a documented recall
tradeoff, the same contract `kg_blocking_stats` audits for the MinHash
blocker.

Oracle exactness: Spark's levenshtein counts codepoints, DuckDB's counts
bytes — identical on ASCII, so the vocabulary is filtered to
length == octet_length surfaces on BOTH sides (a no-op on this corpus).
Every output is a string or BIGINT; no float discipline.

Reference contact: the reference links aliases by exact surface match
only (ner_api.py output lists); fuzzy candidates extend the linking
family of operators/linking.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DIST = 2
_PROBE_OFFSETS = (0, 1, 2)


def fuzzy_alias_pairs(mentions: DataFrame,
                      max_dist: int = MAX_DIST) -> DataFrame:
    """mentions(text, ...) -> (text_a, text_b, dist, n_a, n_b) pairs of
    distinct surfaces with levenshtein <= max_dist under (first char,
    length<=+2) blocking; text_a < text_b, each pair once."""
    from ..cache import tracked_persist

    surfaces = tracked_persist(
        mentions.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .where(F.length("text") == F.octet_length("text"))
        .select(
            "text", "n_mentions",
            F.substring("text", 1, 1).alias("first"),
            F.length("text").alias("len"),
        )
    )
    anchor = surfaces.select(
        F.col("text").alias("text_l"), "first",
        F.col("len").alias("key"),
    )
    probe = surfaces.select(
        F.col("text").alias("text_r"), "first",
        F.explode(
            F.array(*[F.col("len") + F.lit(o) for o in _PROBE_OFFSETS])
        ).alias("key"),
    )
    cand = (
        anchor.join(probe, ["first", "key"])
        .where(F.col("text_l") != F.col("text_r"))
        .select(
            F.least("text_l", "text_r").alias("text_a"),
            F.greatest("text_l", "text_r").alias("text_b"),
        )
        .distinct()
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .where(F.col("dist") <= max_dist)
    )
    na = surfaces.select(F.col("text").alias("text_a"),
                         F.col("n_mentions").alias("n_a"))
    nb = surfaces.select(F.col("text").alias("text_b"),
                         F.col("n_mentions").alias("n_b"))
    return cand.join(na, "text_a").join(nb, "text_b").select(
        "text_a", "text_b", "dist", "n_a", "n_b"
    )


def fuzzy_alias_sql(mentions_sql: str, max_dist: int = MAX_DIST) -> str:
    """DuckDB twin: same blocking keys, same ASCII guard, same
    least/greatest pair normalization."""
    probes = ", ".join(f"len + {o}" for o in _PROBE_OFFSETS)
    return f"""
    WITH mentions AS ({mentions_sql}),
    surfaces AS (
      SELECT text, COUNT(*) AS n_mentions,
             substr(text, 1, 1) AS first, length(text) AS len
      FROM mentions
      GROUP BY text
      HAVING length(text) = strlen(text)),
    probe AS (
      SELECT text AS text_r, first, unnest([{probes}]) AS key
      FROM surfaces),
    cand AS (
      SELECT DISTINCT least(a.text, p.text_r) AS text_a,
                      greatest(a.text, p.text_r) AS text_b
      FROM surfaces a JOIN probe p
        ON p.first = a.first AND p.key = a.len
      WHERE a.text <> p.text_r),
    near_pairs AS (
      SELECT text_a, text_b, levenshtein(text_a, text_b) AS dist
      FROM cand
      WHERE levenshtein(text_a, text_b) <= {max_dist})
    SELECT c.text_a, c.text_b, c.dist,
           sa.n_mentions AS n_a, sb.n_mentions AS n_b
    FROM near_pairs c
    JOIN surfaces sa ON sa.text = c.text_a
    JOIN surfaces sb ON sb.text = c.text_b
    """
