"""Gram matrix + chi-square keywords: NumPy/SciPy-free hand verification on
tiny frames (oracle parity runs in tests/driver_compare.py; plan shape is
asserted in tests/test_plans.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from ehr_ner_spark.operators.chisq import chi2_keywords
from ehr_ner_spark.operators.gram import MICRO, embedding_gram


def test_gram_matches_numpy(spark):
    """G[i, j] == (K^T K)[i, j] for the micro-quantized matrix, including
    negative entries and an upper-triangle-only output."""
    rng = np.random.RandomState(7)
    X = rng.uniform(-0.9, 0.9, size=(23, 4))
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]]) for i in range(23)]
    ).repartition(5)
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in embedding_gram(emb, dim=4).collect()
    }
    K = np.floor(X * MICRO + 0.5).astype(np.int64)
    G = K.T @ K
    assert len(got) == 4 * 5 // 2
    for i in range(4):
        for j in range(i, 4):
            assert got[(i, j)] == G[i, j]


def test_gram_empty_partitions(spark):
    """More partitions than rows: empty partitions contribute nothing and
    the aggregate still covers every cell."""
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.5, -0.5]), Row(vec_id=1, embedding=[0.25, 0.0])]
    ).repartition(8)
    got = {(r["i"], r["j"]): r["gram"] for r in embedding_gram(emb, dim=2).collect()}
    # k rows: (500000, -500000), (250000, 0)
    assert got == {
        (0, 0): 500000**2 + 250000**2,
        (0, 1): 500000 * -500000,
        (1, 1): 500000**2,
    }


def _chi2(a, b, c, d):
    n = a + b + c + d
    num = n * (a * d - b * c) ** 2
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return num / den


def test_chi2_hand_counts(spark):
    """6 en + 4 de docs; 'foo' in 5/6 en and 1/4 de -> chi2 from the
    textbook 2x2 formula; 'bar' everywhere -> filtered (df == N); repeated
    occurrences inside one doc count once (presence, not frequency)."""
    rows = []
    for i in range(6):
        txt = "bar " + ("foo foo foo " if i < 5 else "baz ")
        rows.append(Row(doc_id=i, text=txt, lang="en"))
    for i in range(6, 10):
        txt = "bar " + ("foo " if i == 6 else "qux ")
        rows.append(Row(doc_id=i, text=txt, lang="de"))
    docs = spark.createDataFrame(rows)
    out = chi2_keywords(docs, k=5, df_min=2).collect()
    by = {(r["lang"], r["term"]): r for r in out}
    # 'bar' is in all 10 docs -> degenerate margin, excluded
    assert not any(t == "bar" for (_, t) in by)
    got = by[("en", "foo")]
    assert got["n_docs"] == 5
    want = _chi2(5, 1, 1, 3)  # a=5 en-with-foo, b=1 en-without, c=1, d=3
    assert abs(got["chi2"] - want) < 1e-6
    # ranks are 1-based, contiguous, and respect the chi2-desc order
    en = sorted((r for r in out if r["lang"] == "en"), key=lambda r: r["rnk"])
    assert [r["rnk"] for r in en] == list(range(1, len(en) + 1))
    assert all(
        en[i]["chi2"] >= en[i + 1]["chi2"] for i in range(len(en) - 1)
    )


def test_chi2_df_min_floor(spark):
    """Terms below the document-frequency floor never appear."""
    rows = [
        Row(doc_id=0, text="rare common", lang="en"),
        Row(doc_id=1, text="common", lang="en"),
        Row(doc_id=2, text="common other", lang="de"),
        Row(doc_id=3, text="other", lang="de"),
    ]
    out = chi2_keywords(spark.createDataFrame(rows), k=5, df_min=2).collect()
    assert not any(r["term"] == "rare" for r in out)
