"""Doc-level incremental KG maintenance: recompute triples ONLY for
documents whose content sha256 changed since the last snapshot.

At 10^12 files you never re-run BERT-QA over the whole corpus because a
crawler delivered 0.1% new revisions — the expensive scorer runs on the
sha-diff alone and the stored triples are reused for everything else.
This operator is the doc-granular sibling of the bucket-granular resume in
io/icetable.py (reference analog for the caching idea: the feature cache
in the reference's utils/feaproducer.py:57-99):

* the previous snapshot materializes two frames: the triples table and a
  doc manifest ``(doc_id, content_sha)`` — exactly what an Iceberg
  snapshot's data + manifest files hold;
* change detection is ONE left-anti equi-join of the new corpus against
  the manifest on ``(doc_id, content_sha)`` — the per-row sha256
  invariant (BASELINE input_hint) doubles as the incremental-diff key, so
  modified AND brand-new docs fall out of the same join;
* unchanged docs keep their stored triples via a left-semi join; deleted
  docs drop automatically (they are in neither join's survivor set);
* only the changed slice enters ``detect_mentions`` — the scorer stage's
  input is the diff, not the corpus.

Correctness contract (what the oracle checks): incremental output ==
full recompute over the new corpus, byte for byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import corpus_from_docs
from .mention_detect import detect_mentions, mentions_as_triples

# deterministic v2 synthesis: every 7th doc gets a one-token revision
REVISION_MARKER = " rev2"
REVISION_MOD = 7


def revise_documents(docs: DataFrame) -> DataFrame:
    """The deterministic "new crawl": doc_id % 7 == 0 gains a suffix."""
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % REVISION_MOD == 0,
               F.concat(F.col("text"), F.lit(REVISION_MARKER)))
        .otherwise(F.col("text")),
    )


def sha_diff(corpus_new: DataFrame, manifest: DataFrame) -> DataFrame:
    """Corpus rows whose (doc_id, content_sha) is not in the manifest —
    modified and brand-new docs in one anti-join."""
    return corpus_new.join(
        manifest.select("doc_id", "content_sha"),
        ["doc_id", "content_sha"], "left_anti",
    )


def incremental_triples(
    spark: SparkSession,
    docs_v1: DataFrame,
    docs_v2: DataFrame,
    table_root: str,
    num_partitions: int = 8,
) -> DataFrame:
    """Snapshot v1 (triples + doc manifest), then produce v2 triples
    incrementally: stored triples for sha-unchanged docs UNION fresh
    detection over the sha-diff only."""
    c1 = corpus_from_docs(docs_v1)
    t1 = mentions_as_triples(detect_mentions(c1, num_partitions=num_partitions))
    t1.write.mode("overwrite").parquet(f"{table_root}/triples")
    c1.select("doc_id", "content_sha").write.mode("overwrite").parquet(
        f"{table_root}/manifest"
    )

    c2 = corpus_from_docs(docs_v2)
    manifest = spark.read.parquet(f"{table_root}/manifest")
    changed = sha_diff(c2, manifest)
    unchanged_ids = c2.join(
        manifest, ["doc_id", "content_sha"], "left_semi"
    ).select("doc_id")
    stored = spark.read.parquet(f"{table_root}/triples")
    return (
        stored.join(unchanged_ids, "doc_id", "left_semi")
        .unionByName(mentions_as_triples(
            detect_mentions(changed, num_partitions=num_partitions)))
        .select("subj", "pred", "obj", "start_pos", "end_pos")
    )


def v2_corpus_sql(corpus_sql: str) -> str:
    """The oracle's v2 corpus: CORPUS_SQL over the revised documents.
    ``corpus_sql`` reads ``FROM documents`` exactly once; the revision is
    spliced in as a derived table with the same name/columns."""
    revised = f"""(SELECT doc_id,
        CASE WHEN doc_id % {REVISION_MOD} = 0
             THEN text || '{REVISION_MARKER}' ELSE text END AS text,
        lang, source, n_chars FROM documents) documents"""
    assert corpus_sql.count("FROM documents") == 1
    return corpus_sql.replace("FROM documents", "FROM " + revised)


def incremental_triples_oracle_sql(corpus_sql: str) -> str:
    """Full recompute over the v2 corpus — equality with the incremental
    output IS the correctness proof."""
    from .mention_sql import mentions_oracle_sql

    return (
        "WITH mentions AS ("
        + mentions_oracle_sql(v2_corpus_sql(corpus_sql))
        + """)
    SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS subj,
           'hasEntityType:' || type          AS pred,
           text                              AS obj,
           start_pos, end_pos
    FROM mentions"""
    )
