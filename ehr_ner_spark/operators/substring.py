"""Positional-token operators: exact substring-span dedup and phrase search.

``substring_spans`` is the exact-substring dedup pass of an LLM data
pipeline (the suffix-array dedup of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", re-expressed as the standard
distributed approximation): every W-token window is hashed, windows are
equi-joined across documents, and runs of consecutive matching windows are
merged into MAXIMAL shared spans via diagonal island detection — so a
verbatim 200-token quote shared by two documents comes back as ONE
(start_a, start_b, span_tokens) row, not 193 window hits.

``phrase_search`` is the positional-index query: all exact occurrences of
an n-term phrase, found by filtering each term's postings FIRST and then
chaining narrow (doc_id, position) equi-joins — the plan a positional
inverted index executes, with no scan ever materializing non-phrase terms
past its filter.

Scale notes (100 TB):
* The window self-join is the ONLY quadratic surface, and it is guarded the
  same way as ``ngram_jaccard_pairs``: window hashes appearing in more than
  ``df_cap`` distinct documents (boilerplate headers, license blocks) are
  removed by a broadcast anti-join BEFORE the join, so no hot key fans out.
* Island merging partitions by (doc_a, doc_b, diagonal) — millions of tiny
  window groups, no global or skewed window.
* Window hashes are md5-60bit (hashing.py) so the DuckDB oracles replay the
  exact same keys; the join carries a long, never the window text.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import tracked_persist
from ..hashing import md5_60_expr
from .parallelism import fan_out

SPAN_WINDOW = 8
SPAN_DF_CAP = 16
PHRASE = ("slow", "hash", "batch")

_TOKEN_RE = "[a-z]+"


def _token_windows(docs_in: DataFrame, w: int,
                   text_col: str) -> DataFrame:
    """(doc_id, i, wkey): md5-60bit key of the w-token window starting at
    0-based token offset i.  Offsets explode BEFORE the window string is
    cut (chunk_documents discipline) so no row holds a doc's window array."""
    return (
        fan_out(docs_in)
        .select(
            "doc_id",
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)"
            ).alias("_arr"),
        )
        .where(F.size("_arr") >= w)
        .select(
            "doc_id",
            "_arr",
            F.explode(F.sequence(F.lit(0), F.size("_arr") - w)).alias("_i"),
        )
        .select(
            "doc_id",
            F.col("_i").cast("long").alias("i"),
            md5_60_expr(
                F.concat_ws(" ", F.expr(f"slice(_arr, _i + 1, {w})"))
            ).alias("wkey"),
        )
    )


def substring_spans(docs_in: DataFrame, w: int = SPAN_WINDOW,
                    df_cap: int = SPAN_DF_CAP,
                    text_col: str = "text") -> DataFrame:
    """Maximal exact shared token spans (>= w tokens) between document
    pairs.  Output: (doc_a, doc_b, start_a, start_b, span_tokens) with
    doc_a < doc_b and 0-based token offsets.

    Pipeline: hash every w-token window -> drop hot windows (document
    frequency > df_cap, broadcast anti-join) -> self equi-join on the hash
    -> merge consecutive hits on the same (pair, ia - ib) diagonal into one
    maximal span (gaps-and-islands: island = ia - row_number)."""
    wins = _token_windows(docs_in, w, text_col)
    hot = (
        wins.groupBy("wkey")
        .agg(F.countDistinct("doc_id").alias("ndoc"))
        .where(F.col("ndoc") > df_cap)
        .select("wkey")
    )
    keep = tracked_persist(
        wins.join(F.broadcast(hot), "wkey", "left_anti")
    )
    a = keep.select(
        F.col("doc_id").alias("doc_a"), F.col("i").alias("ia"), "wkey"
    )
    b = keep.select(
        F.col("doc_id").alias("doc_b"), F.col("i").alias("ib"), "wkey"
    )
    pairs = (
        a.join(b, "wkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("diag", F.col("ia") - F.col("ib"))
    )
    isl = pairs.withColumn(
        "island",
        F.col("ia")
        - F.row_number().over(
            Window.partitionBy("doc_a", "doc_b", "diag").orderBy("ia")
        ),
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("ia").alias("start_a"),
            F.min("ib").alias("start_b"),
            (F.max("ia") - F.min("ia") + F.lit(w)).cast("long")
            .alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


def substring_spans_sql(w: int = SPAN_WINDOW, df_cap: int = SPAN_DF_CAP,
                        table: str = "documents",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`substring_spans` — same tokenizer, md5-60bit
    window keys, hot-window cap, diagonal island merge."""
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower({text_col}), '{_TOKEN_RE}') AS w
      FROM {table}),
    wins AS (
      SELECT doc_id, i::BIGINT AS i,
             ('0x' || substr(md5(array_to_string(w[i + 1 : i + {w}], ' ')),
                             1, 15))::BIGINT AS wkey
      FROM w, LATERAL UNNEST(range(len(w) - {w} + 1)) AS u(i)
      WHERE len(w) >= {w}),
    dfreq AS (
      SELECT wkey FROM wins GROUP BY wkey
      HAVING COUNT(DISTINCT doc_id) > {df_cap}),
    keep AS (
      SELECT * FROM wins WHERE wkey NOT IN (SELECT wkey FROM dfreq)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS ia, b.i AS ib,
             a.i - b.i AS diag
      FROM keep a JOIN keep b ON a.wkey = b.wkey AND a.doc_id < b.doc_id),
    isl AS (
      SELECT doc_a, doc_b, ia, ib, diag,
             ia - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY ia) AS island
      FROM pairs)
    SELECT doc_a, doc_b, MIN(ia)::BIGINT AS start_a, MIN(ib)::BIGINT AS start_b,
           (MAX(ia) - MIN(ia) + {w})::BIGINT AS span_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, island
    """


def phrase_search(docs_in: DataFrame, phrase: Sequence[str] = PHRASE,
                  text_col: str = "text") -> DataFrame:
    """All exact occurrences of ``phrase`` as a token sequence.  Output:
    (doc_id, match_pos) with 0-based token offset of the first phrase term.

    Each term filters the token stream FIRST (only phrase-term postings
    survive the scan stage), then the k postings streams chain-join on
    (doc_id, aligned start position) — the execution shape of a positional
    inverted-index query; every join is a narrow equi-join."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase must have at least one term")
    toks = tracked_persist(
        fan_out(docs_in)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)")
            ).alias("pos", "term"),
        )
    )
    out = (
        toks.where(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").cast("long").alias("match_pos"))
    )
    for k, term in enumerate(terms[1:], start=1):
        nxt = toks.where(F.col("term") == term).select(
            "doc_id", (F.col("pos") - k).cast("long").alias("match_pos")
        )
        out = out.join(nxt, ["doc_id", "match_pos"])
    return out


def phrase_search_sql(phrase: Sequence[str] = PHRASE,
                      table: str = "documents",
                      text_col: str = "text") -> str:
    """DuckDB twin of :func:`phrase_search` (same tokenizer, same 0-based
    aligned-start join)."""
    terms = [t.lower() for t in phrase]
    joins = "\n    ".join(
        f"JOIN toks t{k} ON t{k}.doc_id = t0.doc_id "
        f"AND t{k}.pos = t0.pos + {k} AND t{k}.term = '{t}'"
        for k, t in enumerate(terms[1:], start=1)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, u.term, (u.i - 1)::BIGINT AS pos FROM (
        SELECT doc_id,
               regexp_extract_all(lower({text_col}), '{_TOKEN_RE}') AS arr
        FROM {table}),
      LATERAL (SELECT unnest(arr) AS term,
                      generate_subscripts(arr, 1) AS i) u)
    SELECT t0.doc_id, t0.pos AS match_pos
    FROM toks t0
    {joins}
    WHERE t0.term = '{terms[0]}'
    """
