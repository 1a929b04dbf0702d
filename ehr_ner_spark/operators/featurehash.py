"""Feature-hashing document embeddings (the hashing trick — Weinberger et
al. 2009, public).  Bridges the text table to the vector operators: a
fixed-dimension embedding computed from token counts with NO learned
vocabulary, so it runs identically on any shard of a 100-TB corpus with
zero coordination (no dictionary broadcast, no fitting pass).

Each token hashes to a bucket (md5-60 % dim) with a deterministic ±1 sign
((h >> 4) % 2); the embedding is the per-bucket signed occurrence sum —
pure integers end to end, so the cross-engine comparison is bit-exact with
no float discipline at all.

Scale shape: tokenize/explode map-side -> ONE map-side-combined
(doc_id, bucket) aggregation -> per-doc map assembly + a dense
transform(sequence(...)) fill, all codegen; docs with no tokens get the
zero vector via a left join from the document spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..hashing import md5_60_expr
from .parallelism import fan_out

HASH_DIM = 16
_TOKEN_RE = "[a-z]+"


def feature_hash_embed(docs_in: DataFrame, text_col: str = "text",
                       dim: int = HASH_DIM) -> DataFrame:
    """(doc_id, embedding array<bigint>[dim]) signed-hash token counts."""
    docs = fan_out(docs_in)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
        ).alias("term"),
    )
    h = md5_60_expr(F.col("term"))
    # md5-60 is non-negative, so % / shiftright match DuckDB's % and >>
    sb = toks.select(
        "doc_id",
        (h % F.lit(dim)).alias("b"),
        (F.shiftright(h, 4) % F.lit(2) * F.lit(2) - F.lit(1)).alias("s"),
    )
    agg = sb.groupBy("doc_id", "b").agg(F.sum("s").alias("v"))
    emb = (
        agg.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("long")), F.lit(0).cast("long")
                ),
            ).alias("embedding"),
        )
    )
    zeros = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0).cast("long")
    )
    return (
        docs.select("doc_id")
        .join(emb, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("embedding"), zeros).alias("embedding"))
    )


def feature_hash_embed_sql(table: str = "documents", text_col: str = "text",
                           dim: int = HASH_DIM) -> str:
    """DuckDB twin of :func:`feature_hash_embed` (same md5-60 bucket/sign,
    integer sums, dense zero fill)."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower({text_col}), '{_TOKEN_RE}')) AS term
      FROM {table}),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
      FROM toks),
    sb AS (
      SELECT doc_id, h % {dim} AS b, ((h >> 4) % 2) * 2 - 1 AS s FROM h),
    agg AS (
      SELECT doc_id, b, SUM(s)::BIGINT AS v FROM sb GROUP BY doc_id, b),
    grid AS (
      SELECT d.doc_id, g.i
      FROM {table} d CROSS JOIN (SELECT unnest(range({dim})) AS i) g),
    dense AS (
      SELECT grid.doc_id, grid.i, COALESCE(a.v, 0)::BIGINT AS v
      FROM grid LEFT JOIN agg a ON a.doc_id = grid.doc_id AND a.b = grid.i)
    SELECT doc_id, list(v ORDER BY i) AS embedding
    FROM dense GROUP BY doc_id
    """
