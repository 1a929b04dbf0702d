"""Distributed BPE tokenizer training (the merge-learning stage).

The operator the reference family never had but every LLM data pipeline
runs before anything else: learn byte-pair-encoding merges from a corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the published algorithm; no reference-repo analog).

Spark-first shape, designed for the 100-TB stage split:

* **Stage 1 — word counting** is the only corpus-sized pass: explode +
  groupBy(word) with map-side partial_count.  At web scale this is the
  classic wordcount; everything after operates on the *vocabulary*
  (distinct words x frequency), which is orders of magnitude smaller and
  stays a DataFrame — never collected.
* **Each merge round** is (a) adjacent-pair counts as a combinable
  SUM(freq) groupBy — no windows; (b) the argmax pair as a combinable
  ``MIN(struct(-cnt, a, b))`` — the LPA winner discipline, map-side
  reducible, deterministic tie-break (count desc, then lexicographic);
  (c) a broadcast of the single winner row back onto the vocab (1-row
  BroadcastNestedLoopJoin — the intended plan, as in kg_hits); (d) the
  greedy left-to-right non-overlapping merge rewrite expressed as a
  literal string ``replace`` over a delimiter-framed symbol string
  (``|a||b|`` -> ``|ab|``) — pure whole-stage codegen, zero Python.
  Both JVM ``replace`` and DuckDB ``replace`` scan leftmost
  non-overlapping, which IS the greedy BPE merge order, so the rewrite
  is engine-exact.  The ``|`` framing makes a symbol boundary explicit:
  a pair pattern can never match inside a longer symbol.
* Rounds are **lineage-truncated** with ``localCheckpoint(eager=True)``
  (the iterative-operator discipline — multi-referencing a per-round
  frame otherwise makes the physical plan exponential).

Counts are integers throughout -> the DuckDB twin (the same rounds
unrolled as MATERIALIZED CTEs) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BPE_ROUNDS = 6
BPE_EOW = "_"  # end-of-word terminal symbol; corpus words are ^[a-z]+$
_WORD_RE = "^[a-z]+$"

# The merge table bpe_merges learns at sf0.001, frozen as literals: the
# deployment-half query (ds_bpe_encode) must be a pure function of its
# input table, so the learned tokenizer ships as constants the way a real
# pipeline ships a merges.txt artifact.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "_"), ("n", "_"), ("o", "r"), ("t", "_"), ("er", "_"),
]


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-sized pass: whitespace-split wordcount, map-side
    combined.  Output is (word, freq) — the vocabulary every merge round
    operates on."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merges(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns one row per round:
    (round, lhs, rhs, merged, pair_count).

    ``checkpoint=False`` keeps the declarative per-round plan visible for
    plan tests; production callers leave the default on so lineage stays
    linear in the number of rounds.
    """
    vocab = word_freq(docs, text_col).select(
        F.concat(F.split("word", ""), F.array(F.lit(BPE_EOW))).alias("syms"),
        "freq",
    )
    merges: DataFrame | None = None
    for r in range(1, rounds + 1):
        if checkpoint:
            vocab = vocab.localCheckpoint(eager=True)
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms)-1)").alias("a"),
                        F.expr("slice(syms, 2, size(syms)-1)").alias("b"),
                    )
                ).alias("p"),
            )
            .select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        winner = (
            pairs.agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("a").alias("a"),
                        F.col("b").alias("b"),
                    )
                ).alias("w")
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                F.col("w.a").alias("lhs"),
                F.col("w.b").alias("rhs"),
                F.concat(F.col("w.a"), F.col("w.b")).alias("merged"),
                (-F.col("w.nc")).cast("long").alias("pair_count"),
            )
        )
        merges = winner if merges is None else merges.unionByName(winner)
        framed = F.concat(F.lit("|"), F.array_join("syms", "||"), F.lit("|"))
        pat = F.concat(
            F.lit("|"), F.col("lhs"), F.lit("||"), F.col("rhs"), F.lit("|")
        )
        rep = F.concat(F.lit("|"), F.col("lhs"), F.col("rhs"), F.lit("|"))
        vocab = (
            vocab.crossJoin(F.broadcast(winner.select("lhs", "rhs")))
            .withColumn("_ns", F.call_function("replace", framed, pat, rep))
            .select(
                F.split(
                    F.expr("substring(_ns, 2, length(_ns) - 2)"), r"\|\|"
                ).alias("syms"),
                "freq",
            )
        )
    assert merges is not None
    return merges


def bpe_merges_sql(
    rounds: int = BPE_ROUNDS, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`bpe_merges`: the same rounds unrolled as
    MATERIALIZED CTEs (inlined CTEs would re-evaluate the chain
    exponentially), same winner tie-break, same framed-replace rewrite."""
    ctes = [
        f"""wf AS MATERIALIZED (
      SELECT word, COUNT(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split_regex({text_col}, '\\s+')) AS word
        FROM {table})
      WHERE regexp_matches(word, '{_WORD_RE}') GROUP BY word),
    v0 AS MATERIALIZED (
      SELECT list_append(string_split(word, ''), '{BPE_EOW}') AS syms, freq
      FROM wf)"""
    ]
    for r in range(1, rounds + 1):
        p = f"v{r - 1}"
        ctes.append(
            f"""p{r} AS (
      SELECT a, b, SUM(freq)::BIGINT AS cnt FROM (
        SELECT freq, syms[i] AS a, syms[i + 1] AS b
        FROM {p}, LATERAL unnest(range(1, len(syms))) AS t(i))
      GROUP BY a, b),
    m{r} AS MATERIALIZED (
      SELECT {r} AS round, a AS lhs, b AS rhs, a || b AS merged,
             cnt AS pair_count
      FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    v{r} AS MATERIALIZED (
      SELECT string_split(substr(ns, 2, length(ns) - 2), '||') AS syms, freq
      FROM (
        SELECT replace('|' || array_to_string(syms, '||') || '|',
                       '|' || m.lhs || '||' || m.rhs || '|',
                       '|' || m.lhs || m.rhs || '|') AS ns, freq
        FROM {p}, m{r} m))"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT round::INT AS round, lhs, rhs, merged, pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Apply a learned merge list to a corpus: per word, replay the merges
    in learned order (the deployment half of the tokenizer).  The merge
    list is tiny (driver-side literals, like a broadcast dict); the
    rewrite is the same framed-replace chain, all codegen.  Returns
    (doc_id, n_words, n_tokens) per document."""
    words = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word").rlike(_WORD_RE))
    framed = F.concat(
        F.lit("|"), F.array_join(
            F.concat(F.split("word", ""), F.array(F.lit(BPE_EOW))), "||"
        ), F.lit("|"),
    )
    expr = framed
    for lhs, rhs in merges:
        expr = F.call_function(
            "replace", expr, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
        )
    n_tok = F.size(F.split(F.expr("substring(_e, 2, length(_e) - 2)"), r"\|\|"))
    return (
        words.withColumn("_e", expr)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(n_tok).cast("long").alias("n_tokens"),
        )
    )
