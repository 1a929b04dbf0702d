"""tf-idf keyword extraction and boilerplate n-gram mining: hand-computed
semantics on tiny corpora (the sf0.001/sf0.01 oracle parity lives in
tests/test_oracle_parity.py::test_query_matches_oracle)."""

from __future__ import annotations

import pytest

from ehr_ner_spark.operators.textops import boilerplate_ngrams, tfidf_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "aspirin dose aspirin dose aspirin"),
        (2, "aspirin warfarin interaction"),
        (3, "warfarin dose warfarin dose"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_ranks_rare_terms_higher(spark, docs):
    rows = {(r["doc_id"], r["term"]): r for r in tfidf_topk(docs).collect()}
    # doc 2: 'interaction' df=1 beats 'aspirin'/'warfarin' df=2 at equal tf
    d2 = sorted(
        (r for (d, _), r in rows.items() if d == 2),
        key=lambda r: r["rnk"],
    )
    assert d2[0]["term"] == "interaction"
    assert d2[0]["tf"] == 1 and d2[0]["df"] == 1
    # N=3 docs, aspirin in docs 1+2: score = tf * (3+1)/(2+1), snapped to 1e-6
    a2 = rows[(2, "aspirin")]
    assert a2["score"] == pytest.approx(1.333333)
    # doc 1: tf dominates within the doc — aspirin (tf=3) ranks first
    d1 = sorted(
        (r for (d, _), r in rows.items() if d == 1),
        key=lambda r: r["rnk"],
    )
    assert d1[0]["term"] == "aspirin" and d1[0]["tf"] == 3


def test_tfidf_k_bound_and_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the of and alpha beta gamma delta epsilon zeta eta")],
        ["doc_id", "text"],
    )
    out = tfidf_topk(df).collect()
    assert len(out) == 5  # k caps the per-doc output
    assert all(r["term"] not in ("the", "of", "and") for r in out)


def test_boilerplate_distinct_per_doc(spark):
    banner = "all rights reserved by example corp"
    rows = [
        # doc 1 repeats the banner — must count ONCE (document frequency)
        (1, banner + " " + banner),
        (2, banner + " unique tail words here"),
        (3, "completely different text with no shared phrases at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["gram"]: r for r in boilerplate_ngrams(df).collect()}
    top = min(out.values(), key=lambda r: r["rnk"])
    assert top["gram"] == "all rights reserved by example"
    assert top["n_docs"] == 2  # docs 1+2, repeat inside doc 1 not double-counted


def test_boilerplate_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "four words only here")], ["doc_id", "text"]
    )
    assert boilerplate_ngrams(df).count() == 0


def test_inverted_index_semantics(spark):
    from ehr_ner_spark.operators.textops import inverted_index

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha beta"),
            (3, "alpha delta"),
        ],
        ["doc_id", "text"],
    )
    out = {r["term"]: r for r in inverted_index(docs, top=2, cap=2).collect()}
    # df tie-break: alpha (df 3) then beta (df 2); gamma/delta cut
    assert set(out) == {"alpha", "beta"}
    assert out["alpha"]["df"] == 3 and out["alpha"]["rnk"] == 1
    assert out["beta"]["df"] == 2 and out["beta"]["rnk"] == 2
    # postings sorted and capped at 2 even though alpha is in 3 docs
    assert out["alpha"]["postings"] == [1, 2]
    assert out["beta"]["postings"] == [1, 2]


def test_inverted_index_dedups_repeats_and_stopwords(spark):
    from ehr_ner_spark.operators.textops import inverted_index

    docs = spark.createDataFrame(
        [(7, "the the zeta zeta zeta")], ["doc_id", "text"]
    )
    rows = inverted_index(docs, top=5, cap=5).collect()
    assert [(r["term"], r["df"], r["postings"]) for r in rows] == [
        ("zeta", 1, [7])
    ]


def test_chunk_documents_overlap_and_tail(spark):
    from ehr_ner_spark.operators.textops import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["chunk_text"], r["n_chunks"])
        )
    # len 10, size 4, stride 3 -> ceil(6/3)+1 = 3 chunks; last is the tail
    assert sorted(by_doc[1]) == [
        (1, 1, "abcd", 3), (2, 4, "defg", 3), (3, 7, "ghij", 3)
    ]
    # shorter than size -> single whole-doc chunk
    assert by_doc[2] == [(1, 1, "abc", 1)]
    # empty text still emits one (empty) chunk
    assert by_doc[3] == [(1, 1, "", 1)]


def test_chunk_documents_covers_every_char(spark):
    from ehr_ner_spark.operators.textops import chunk_documents

    text = "x" * 1003
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(docs).collect(), key=lambda r: r["chunk_start"]
    )
    covered = set()
    for r in rows:
        covered.update(
            range(r["chunk_start"], r["chunk_start"] + len(r["chunk_text"]))
        )
    assert covered == set(range(1, len(text) + 1))


def test_vocab_coverage_invariants(spark, sf_dir):
    from ehr_ner_spark.operators.textops import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = vocab_coverage(docs, k=50).collect()
    assert {r.lang for r in rows} == {
        r.lang for r in docs.select("lang").distinct().collect()
    }
    for r in rows:
        assert 0 < r.covered_tokens <= r.total_tokens
        assert 0 < r.covered_distinct <= min(50, r.distinct_tokens)
    # k = 0 vocabulary covers nothing
    empty = vocab_coverage(docs, k=0).collect()
    assert all(r.covered_tokens == 0 and r.covered_distinct == 0 for r in empty)


def test_relation_cardinality_classes(spark):
    from ehr_ner_spark.entrypoints import QUERIES_REGISTRY

    import conftest

    out = QUERIES_REGISTRY["kg_relation_cardinality"](spark, conftest.SF_DIR)
    rows = out.collect()
    assert rows, "no predicates emitted"
    for r in rows:
        assert r.n_triples >= max(r.n_subj, r.n_obj)
        expect = (
            "N-N" if r.max_obj_per_subj > 1 and r.max_subj_per_obj > 1
            else "1-N" if r.max_obj_per_subj > 1
            else "N-1" if r.max_subj_per_obj > 1 else "1-1"
        )
        assert r.card_class == expect


def test_lm_buckets_are_language_local_terciles(spark, sf_dir):
    from ehr_ner_spark.operators.retrieval import lm_quality_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = lm_quality_buckets(docs).collect()
    assert rows
    for r in rows:
        assert r.c33 <= r.c67
        expect = (
            "tail" if r.q <= r.c33 else "middle" if r.q <= r.c67 else "head"
        )
        assert r.bucket == expect
    # each language has all three buckets when it has enough docs
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.bucket)
    for lang, buckets in by_lang.items():
        n = sum(1 for r in rows if r.lang == lang)
        if n >= 30:
            assert buckets == {"head", "middle", "tail"}, (lang, buckets)


def test_rrf_fusion_hand_math(spark):
    """RRF arithmetic: a doc ranked r1/r2 by the two legs scores
    1/(60+r1) + 1/(60+r2); a single-leg doc scores one reciprocal and
    reports rank 0 for the absent leg."""
    from ehr_ner_spark.operators.retrieval import (
        bm25_topk,
        dense_topk,
        rrf_fusion,
    )

    docs = spark.createDataFrame(
        [(i, f"hash join stream batch window doc{i} "
              f"{'table scan ' * (i % 3)}filler") for i in range(12)],
        "doc_id long, text string",
    )
    bm = {(r.query_id, r.doc_id): r.rnk for r in bm25_topk(docs).collect()}
    dn = {(r.query_id, r.doc_id): r.rnk for r in dense_topk(docs).collect()}
    for r in rrf_fusion(docs).collect():
        key = (r.query_id, r.doc_id)
        want = 0.0
        if key in bm:
            want += 1.0 / (60 + bm[key])
            assert r.bm_rnk == bm[key]
        else:
            assert r.bm_rnk == 0
        if key in dn:
            want += 1.0 / (60 + dn[key])
            assert r.dense_rnk == dn[key]
        else:
            assert r.dense_rnk == 0
        import math

        assert r.rrf == math.floor(want * 1e8 + 0.5) / 1e8


def test_rrf_output_rank_bounded(spark):
    """Fusion emits at most topk rows per query, ranked 1..n by fused
    score with doc_id tie-break."""
    from ehr_ner_spark.operators.retrieval import RRF_TOPK, rrf_fusion

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = rrf_fusion(docs).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RRF_TOPK
        scores = [r.rrf for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_rank_correlation_hand_math(spark):
    """Kendall tau counts verified against scipy-free brute force on the
    actual leg outputs."""
    from ehr_ner_spark.operators.retrieval import (
        bm25_topk,
        dense_topk,
        rank_correlation,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bm = {}
    for r in bm25_topk(docs).collect():
        bm[(r.query_id, r.doc_id)] = r.rnk
    dn = {}
    for r in dense_topk(docs).collect():
        dn[(r.query_id, r.doc_id)] = r.rnk

    got = {r.query_id: r for r in rank_correlation(docs).collect()}
    import math

    by_q = {}
    for (q, d), rb in bm.items():
        if (q, d) in dn:
            by_q.setdefault(q, []).append((d, rb, dn[(q, d)]))
    for q, items in by_q.items():
        n = len(items)
        if n < 2:
            assert q not in got
            continue
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (items[i][1] - items[j][1]) * (items[i][2] - items[j][2])
                if s > 0:
                    conc += 1
                else:
                    disc += 1
        r = got[q]
        assert (r.n_common, r.n_pairs, r.concordant, r.discordant) == (
            n, n * (n - 1) // 2, conc, disc)
        assert r.tau_micro == math.floor(1e6 * (conc - disc) / r.n_pairs)
