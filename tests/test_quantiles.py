"""Exact value-histogram quantiles: hand-checked type-1 semantics plus a
pure-Python reference over a randomized frame."""

from __future__ import annotations

import math
import random

from ehr_ner_spark.operators.quantiles import QUANTILES, length_quantiles


def _py_quantiles(values, qs=QUANTILES):
    """Type-1 (lower-edge) quantile: smallest v with cum >= ceil(q*n/100)."""
    s, n = sorted(values), len(values)
    return {q: s[max(0, math.ceil(q * n / 100) - 1)] for q in qs}


def _collect(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    return {(r["lang"], r["metric"], r["q_pct"]): r["value"]
            for r in length_quantiles(df).collect()}


def test_quantiles_hand_case(spark):
    docs = [(i, "en", "x" * i) for i in range(1, 11)]  # lengths 1..10
    out = _collect(spark, docs)
    # n=10: p50 -> ceil(5)=5th value = 5; p90 -> 9; p99 -> ceil(9.9)=10th
    assert out[("en", "n_chars", 50)] == 5
    assert out[("en", "n_chars", 90)] == 9
    assert out[("en", "n_chars", 99)] == 10
    assert out[("en", "n_chars", 100)] == 10
    # every doc is one "word"
    assert out[("en", "n_words", 50)] == 1


def test_quantiles_match_python_reference(spark):
    rng = random.Random(7)
    docs = []
    for i in range(300):
        lang = ("en", "zh")[i % 2]
        words = ["w" * rng.randint(1, 6) for _ in range(rng.randint(1, 30))]
        docs.append((i, lang, " ".join(words)))
    out = _collect(spark, docs)
    for lang in ("en", "zh"):
        chars = [len(t) for (_i, lg, t) in docs if lg == lang]
        words = [len(t.split()) for (_i, lg, t) in docs if lg == lang]
        for q, v in _py_quantiles(chars).items():
            assert out[(lang, "n_chars", q)] == v
        for q, v in _py_quantiles(words).items():
            assert out[(lang, "n_words", q)] == v


def test_iqr_classify_fences(spark, sf_dir):
    from ehr_ner_spark.operators.quantiles import iqr_classify

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = iqr_classify(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r.q1 <= r.q3
        iqr = r.q3 - r.q1
        expect = (
            "lo" if r.n_chars < r.q1 - iqr
            else "hi" if r.n_chars > r.q3 + iqr else "in"
        )
        assert r.side == expect
    # fences hold at least half the corpus per lang (Q1..Q3 alone is ~50%)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.side)
    for sides in by_lang.values():
        assert sides.count("in") >= len(sides) // 2
