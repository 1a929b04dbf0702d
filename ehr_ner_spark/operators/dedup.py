"""Document-level deduplication family for large-scale training-data
pipelines (first-class engine components; the reference's D1 exact span
dedup, dataAugmentator.py:59-69, is the semantic seed — these scale it to
corpus level).

* exact_dedup        — hash-groupBy on content (canonical representative =
                       min doc_id; pure built-ins, one shuffle)
* minhash_lsh_dedup  — char-shingle MinHash + LSH banding + Jaccard verify +
                       connected components (reuses the linking machinery —
                       identical math, different key)
* simhash_dedup      — 64-bit SimHash over word features; Hamming<=k matching
                       via 4x16-bit band buckets (pigeonhole: any pair within
                       Hamming 3 shares at least one exact 16-bit band)
* ngram_jaccard_pairs— word n-gram Jaccard similarity pairs, fully
                       SQL-expressible (the DuckDB-oracle-checkable variant)
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .linking import candidate_pairs, connected_components, verified_edges


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: keep min id per identical content.
    Output: (doc_id, canonical_doc_id, group_size)."""
    groups = docs.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        docs.select(id_col, text_col)
        .join(groups, text_col)
        .select(id_col, "canonical_doc_id", "group_size")
    )


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.8) -> DataFrame:
    """Near-dup clusters via the linking LSH stack keyed by document text.
    Output: (doc_id, component) — component = cluster id over doc contents."""
    pseudo_mentions = docs.select(F.col(text_col).alias("text"), F.col(id_col))
    from .linking import surface_signatures

    sigs = surface_signatures(pseudo_mentions)
    pairs = candidate_pairs(sigs)
    edges = verified_edges(sigs, pairs, threshold)
    comps = connected_components(sigs.select("surface_id"), edges)
    return (
        pseudo_mentions.withColumn("surface_id", F.xxhash64("text"))
        .join(comps, "surface_id", "left")
        .select(
            id_col,
            F.coalesce("component", F.col("surface_id")).alias("component"),
        )
    )


_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace-token features (Arrow-batched)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                toks = t.split()
                if not toks:
                    out.append(0)
                    continue
                h = np.fromiter(
                    (zlib.crc32(w.encode()) * 2654435761 % (1 << 64) for w in toks),
                    dtype=np.uint64, count=len(toks),
                )
                bitmat = ((h[:, None] >> bits[None, :]) & 1).astype(np.int64)
                v = (2 * bitmat - 1).sum(axis=0)
                sh = int(((v > 0).astype(np.uint64) << bits).sum())
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"doc_id": pdf[id_col], "simhash": out})

    from ..pyfiles import ensure_shipped

    ensure_shipped(docs.sparkSession)
    return docs.select(id_col, text_col).mapInPandas(compute, _SIMHASH_SCHEMA)


def simhash_dedup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= k via 16-bit band blocking
    (4 bands; Hamming<=3 guarantees an exact band match), then exact
    popcount verification.  Output: (src, dst, hamming), src < dst."""
    sh = simhash(docs, text_col, id_col)
    bands = sh.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                for b in range(4)
            ])
        ).alias("band", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["src", "dst"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("src", "dst", "hamming")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Word n-gram Jaccard near-dup pairs, expressed entirely with built-in
    relational algebra (shuffle on shingle, then on pair) so it is
    SQL-oracle-checkable and Catalyst-optimizable end to end.
    Output: (src, dst, jaccard) with src < dst, jaccard >= threshold."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("w")
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - n),
                lambda i: F.array_join(F.slice("w", i + 1, n), " "),
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "src").withColumnRenamed("n_sh", "sz_a"), "src")
        .join(sizes.withColumnRenamed("doc_id", "dst").withColumnRenamed("n_sh", "sz_b"), "dst")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )
