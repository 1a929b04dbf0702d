"""Property-based equivalence of the flagship SQL oracle and the kernel.

Hypothesis generates adversarial documents (CJK, Unicode spaces, long
alphanumeric runs past the old piece caps, punctuation soup, newlines/tabs,
quotes) and asserts that the DuckDB twin of battery mention detection
(operators/mention_sql.py) emits EXACTLY the kernel's spans.  This is the
fuzzing layer on top of the fixed-corpus parity tests — it is what caught
the Unicode-whitespace and piece-cap divergence classes.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from ehr_ner_spark.corpus import CORPUS_SQL
from ehr_ner_spark.kernel.predict import predict_battery
from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
from ehr_ner_spark.kernel.wordpiece import tokenize_text
from ehr_ner_spark.operators.mention_sql import mentions_oracle_sql
from ehr_ner_spark.queries_battery import QUERIES

# characters spanning every tokenizer class: ASCII alnum runs, ASCII
# whitespace, Unicode spaces (NBSP, ideographic space), CJK, diacritics,
# punctuation incl. quotes/backslash/hash
_ALPHABET = (
    "abcXYZ019 \t\n 　"
    "病人於年月日入院treatment"
    "éßñ漢字.,;:'\"\\#-()[]##"
)

_doc = st.text(alphabet=_ALPHABET, min_size=0, max_size=160)
_long_run = st.integers(min_value=120, max_value=200).map(lambda n: "q" * n)
_docs = st.lists(
    st.one_of(_doc, st.tuples(_doc, _long_run).map(lambda t: f"{t[0]} {t[1]}")),
    min_size=1,
    max_size=3,
)

_BATTERY = [(t, tokenize_text(q)) for t, q in QUERIES.items()]


def _kernel_spans(texts):
    scorer = DeterministicQAScorer()
    out = set()
    for did, text in enumerate(texts):
        for (_p, typ, s, e, txt) in predict_battery(
            scorer, _BATTERY, tokenize_text(text), pid=did
        ):
            out.add((did, typ, s, e, txt))
    return out


@settings(max_examples=15, deadline=None)
@given(_docs)
def test_mentions_oracle_matches_kernel_on_adversarial_text(texts):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    got = set(con.execute(mentions_oracle_sql(CORPUS_SQL)).fetchall())
    expected = _kernel_spans(texts)
    assert got == expected


def _sl_kernel_spans(texts):
    from ehr_ner_spark.kernel.sl import DeterministicSLScorer, sl_predict

    scorer = DeterministicSLScorer(list(QUERIES.keys()))
    out = set()
    for did, text in enumerate(texts):
        for (_p, typ, s, e, txt) in sl_predict(
            scorer, tokenize_text(text), pid=did
        ):
            out.add((did, typ, s, e, txt))
    return out


@settings(max_examples=10, deadline=None)
@given(_docs)
def test_sl_oracle_matches_kernel_on_adversarial_text(texts):
    from ehr_ner_spark.operators.mention_sql import sl_mentions_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    got = set(con.execute(sl_mentions_oracle_sql(CORPUS_SQL)).fetchall())
    assert got == _sl_kernel_spans(texts)


def _crf_kernel_spans(texts, max_seq_length=128):
    from ehr_ner_spark.kernel.predict import predict_battery_crf

    scorer = DeterministicQAScorer()
    out = set()
    for did, text in enumerate(texts):
        for (_p, typ, s, e, txt) in predict_battery_crf(
            scorer, _BATTERY, tokenize_text(text), pid=did,
            max_seq_length=max_seq_length, _prefix_cache={},
        ):
            out.add((did, typ, s, e, txt))
    return out


@settings(max_examples=10, deadline=None)
@given(_docs)
def test_crf_oracle_matches_kernel_on_adversarial_text(texts):
    """The recursive-CTE Viterbi twin (forward + backtrace) agrees with the
    kernel on adversarial Unicode/long-token documents — the fuzz layer on
    top of the fixed-corpus kg_mentions_crf hash check."""
    from ehr_ner_spark.operators.crf_sql import mentions_crf_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    got = set(con.execute(mentions_crf_oracle_sql(CORPUS_SQL, 128)).fetchall())
    assert got == _crf_kernel_spans(texts, 128)


def _sl_crf_kernel_spans(texts, max_seq_length=128):
    from ehr_ner_spark.kernel.sl_crf import sl_crf_predict

    scorer = DeterministicQAScorer()
    types = list(QUERIES.keys())
    out = set()
    for did, text in enumerate(texts):
        for (_p, typ, s, e, txt) in sl_crf_predict(
            scorer, types, tokenize_text(text), pid=did,
            max_seq_length=max_seq_length,
        ):
            out.add((did, typ, s, e, txt))
    return out


@settings(max_examples=10, deadline=None)
@given(_docs)
def test_sl_crf_oracle_matches_kernel_on_adversarial_text(texts):
    """The LIST-typed 65-state CRF twin agrees with the kernel under fuzz."""
    from ehr_ner_spark.operators.sl_crf_sql import sl_crf_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents"
        " (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    got = set(con.execute(sl_crf_oracle_sql(CORPUS_SQL, 128)).fetchall())
    assert got == _sl_crf_kernel_spans(texts, 128)
