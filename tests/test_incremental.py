"""Doc-level incremental KG maintenance (operators/incremental.py):
sha-diff detection finds exactly the revised docs, the scorer's stage-2
input IS the diff, and incremental output == full recompute."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ehr_ner_spark.corpus import corpus_from_docs, load_documents
from ehr_ner_spark.operators.incremental import (
    REVISION_MOD,
    incremental_triples,
    revise_documents,
    sha_diff,
)
from ehr_ner_spark.operators.mention_detect import (
    detect_mentions,
    mentions_as_triples,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_documents(spark, sf_dir)


def test_sha_diff_finds_exactly_the_revised_docs(spark, docs):
    c1 = corpus_from_docs(docs)
    c2 = corpus_from_docs(revise_documents(docs))
    manifest = c1.select("doc_id", "content_sha")
    changed = sha_diff(c2, manifest)
    got = sorted(r["doc_id"] for r in changed.select("doc_id").collect())
    expect = sorted(r["doc_id"] for r in docs.collect()
                    if r["doc_id"] % REVISION_MOD == 0)
    assert got == expect
    # identical corpus -> empty diff
    assert sha_diff(c1, manifest).count() == 0


def test_incremental_equals_full_recompute(spark, docs):
    root = tempfile.mkdtemp(prefix="test_incremental_")
    try:
        v2 = revise_documents(docs)
        inc = incremental_triples(spark, docs, v2, root, num_partitions=4)
        full = mentions_as_triples(
            detect_mentions(corpus_from_docs(v2), num_partitions=4)
        ).select("subj", "pred", "obj", "start_pos", "end_pos")
        cols = ["subj", "pred", "obj", "start_pos", "end_pos"]
        got = sorted(map(tuple, inc.select(cols).collect()))
        expect = sorted(map(tuple, full.collect()))
        assert got == expect and len(got) > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_new_docs_fall_out_of_the_diff_too(spark, docs):
    c1 = corpus_from_docs(docs)
    extra = docs.limit(3).selectExpr(
        "doc_id + 1000000 AS doc_id", "text || ' brand new' AS text",
        "lang", "source", "n_chars"
    )
    c2 = corpus_from_docs(docs.unionByName(extra))
    changed = sha_diff(c2, c1.select("doc_id", "content_sha"))
    got = sorted(r["doc_id"] for r in changed.select("doc_id").collect())
    assert got == sorted(r["doc_id"] + 1000000
                         for r in docs.limit(3).collect())
