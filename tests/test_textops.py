"""Text-analysis operators: language-ID heuristic on genuinely multilingual
text (the synthetic driver corpus is English word-soup for every lang label,
so real-language behavior is pinned here), plus Spark<->DuckDB twin equality
on texts exercising the CJK/diacritic regex classes.
"""

from __future__ import annotations

import duckdb
import pytest

from ehr_ner_spark.operators.textops import lang_id, lang_id_sql

MULTILINGUAL = [
    (0, "the cat sat on the mat and it is happy with that for now"),
    (1, "der Hund ist nicht mit der Katze und das ist schön für alle"),
    (2, "le chat est dans la maison et les oiseaux chantent pour une fête"),
    (3, "el perro está en la casa y los gatos son una familia para todos"),
    (4, "今天天气很好我们一起去公园散步吧然后喝茶"),
    (5, "mixed bag zzz qqq xxx"),  # no markers at all -> alphabetical tie
]

EXPECTED = {0: "en", 1: "de", 2: "fr", 3: "es", 4: "zh", 5: "de"}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(MULTILINGUAL, "doc_id long, text string")


def test_lang_id_real_languages(spark, docs):
    got = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert got == EXPECTED


def test_lang_id_zero_evidence_conf(spark, docs):
    confs = {r.doc_id: r.conf_ppm for r in lang_id(docs).collect()}
    assert confs[5] == 0
    assert confs[4] > 0  # CJK evidence


def test_lang_id_matches_duckdb_twin(spark, docs):
    spark_rows = {
        (r.doc_id, r.lang_pred, r.conf_ppm) for r in lang_id(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", MULTILINGUAL)
    duck_rows = set(map(tuple, con.execute(lang_id_sql()).fetchall()))
    assert spark_rows == duck_rows


def test_fingerprint_winnow_no_ansi_overflow(spark):
    """The winnow fold is modular — evaluating winnow_fp must not raise
    ARITHMETIC_OVERFLOW under Spark 4 ANSI mode (regression: the old
    acc*31+x fold over full-range xxhash64 longs overflowed int64)."""
    from ehr_ner_spark.operators.textops import fingerprint

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(40)))], "doc_id long, text string"
    )
    rows = fingerprint(docs).collect()
    assert rows[0].winnow_fp is not None
    assert 0 <= rows[0].winnow_fp < (1 << 55)


def test_redact_pii_semantics(spark):
    from ehr_ner_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail a.b-c_1@ex-ample.co.uk now"),
            (1, "call 555-123 4567 or 02 2345 6789"),
            (2, "host 10.0.255.1 and 999.999.999.999"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert rows[0].clean_text == "mail <EMAIL> now" and rows[0].n_email == 1
    assert "<PHONE>" in rows[1].clean_text and rows[1].n_phone == 1
    # both dotted quads match the shape pattern (audit, not validation)
    assert rows[2].clean_text == "host <IP> and <IP>" and rows[2].n_ipv4 == 2
    assert rows[3].clean_text == "clean text only"
    assert (rows[3].n_email, rows[3].n_phone, rows[3].n_ipv4) == (0, 0, 0)


def test_repetition_stats_semantics(spark):
    from ehr_ner_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),        # one bigram dominates
            (1, "all words here are unique now"),   # no repetition
            (2, "x"),                               # degenerate: <2 words
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[0].top_bigram_ratio == 1.0 and rows[0].distinct_word_ratio == 0.2
    assert rows[1].top_bigram_ratio == 0.2 and rows[1].distinct_word_ratio == 1.0
    assert rows[2].n_bigrams == 1  # the '' sentinel gram


def test_curation_funnel_is_monotone(spark, sf_dir):
    """The cumulative survivor counts can only fall; stage 0 is the corpus."""
    from ehr_ner_spark.operators.curation import curation_funnel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(curation_funnel(docs).collect(), key=lambda r: r.stage)
    assert rows[0].docs_surviving == docs.count()
    counts = [r.docs_surviving for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert len(rows) == 7


def test_ngram_novelty_first_bucket_full_and_repeats_drop(spark):
    """Two buckets: bucket 0 defines the vocabulary (novelty 10000);
    bucket 1 repeats one trigram and adds one new -> 5000 bp."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c", lang="en", source="s", n_chars=5),
            Row(doc_id=7, text="a b c x y z", lang="en", source="s",
                n_chars=11),
        ]
    )
    out = {r.bucket: r for r in ngram_novelty(docs, n_buckets=2).collect()}
    # doc 0 -> bucket (0*2) DIV 8 = 0; doc 7 -> (14) DIV 8 = 1
    assert out[0].n_distinct == 1 and out[0].novelty_bp == 10000
    # bucket 1 grams: 'a b c' (seen), 'b c x', 'c x y', 'x y z' (new)
    assert out[1].n_distinct == 4 and out[1].n_new == 3
    assert out[1].novelty_bp == 7500
