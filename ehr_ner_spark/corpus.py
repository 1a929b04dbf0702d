"""Source-code-repository corpus per BASELINE.json ``input_hint``:

    (repo: string, path: string, commit: string, lang: string, content: string)

At production scale this is an Iceberg table of 10^12 files partitioned by
``bucket(N, repo)``; in this sandbox it is synthesized **deterministically**
from the driver's ``documents`` parquet (doc_id, text, lang, source, n_chars)
so that the DuckDB oracle can derive the identical corpus with plain SQL
(same expressions, see CORPUS_SQL below).

``doc_id`` is retained as the stable document key; the per-row invariant
``content_sha = sha2(content, 256)`` is attached at the source and carried
through every stage (BASELINE.json input_hint: "per-row invariant vs the
reference: content sha256 equality").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_REPOS = 50  # synthetic repos; at scale 'repo' is the natural bucket key


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (repo, path, commit, lang, content) corpus + lineage cols."""
    return corpus_from_docs(load_documents(spark, sf_dir))


def corpus_from_docs(docs: DataFrame) -> DataFrame:
    """The corpus derivation over an arbitrary documents frame — the same
    expressions as CORPUS_SQL, so a streamed micro-batch of documents rows
    yields byte-identical corpus rows to the batch scan."""
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("repo_"), (F.col("doc_id") % N_REPOS).cast("string")).alias("repo"),
        F.concat(F.lit("src/"), F.col("source"), F.lit("/doc_"),
                 F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.concat(F.lit("commit:"), F.col("doc_id").cast("string"))).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


# The same derivation as ANSI/DuckDB SQL (documents is a pre-registered view).
# Used as a CTE by oracle queries so Spark and DuckDB agree byte-for-byte.
CORPUS_SQL = """
SELECT
  doc_id,
  'repo_' || CAST(doc_id % 50 AS VARCHAR)                         AS repo,
  'src/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
  md5('commit:' || CAST(doc_id AS VARCHAR))                        AS commit,
  lang,
  text                                                             AS content,
  sha256(text)                                                     AS content_sha
FROM documents
"""
