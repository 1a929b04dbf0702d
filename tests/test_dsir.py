"""DSIR-style hashed-ngram importance selection: hand-computed semantics
on tiny frames plus a pure-Python replication of the whole scoring chain
(oracle parity runs in tests/driver_compare.py; plan shape is asserted in
tests/test_plans.py)."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import Row

from ehr_ner_spark.hashing import md5_60
from ehr_ner_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_SALT,
    DSIR_TARGET_LANG,
    dsir_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg) for i, (t, lg) in enumerate(rows)]
    )


def _bucket(term: str) -> int:
    return md5_60(f"{DSIR_SALT}:{term}") % DSIR_BUCKETS


def _py_weights(rows):
    """Pure-Python replication of the engine's scoring chain."""
    toks = []
    for i, (t, lg) in enumerate(rows):
        for term in re.findall(r"[a-z]+", t.lower()):
            toks.append((i, lg, _bucket(term)))
    t_cnt, r_cnt = Counter(), Counter()
    for _, lg, b in toks:
        r_cnt[b] += 1
        if lg == DSIR_TARGET_LANG:
            t_cnt[b] += 1
    t_tot = sum(t_cnt.values())
    r_tot = sum(r_cnt.values())
    score = {
        b: math.floor(
            ((t_cnt[b] + 1.0) / (t_tot + float(DSIR_BUCKETS)))
            / ((r_cnt[b] + 1.0) / (r_tot + float(DSIR_BUCKETS)))
            * 1000000.0
            + 0.5
        )
        for b in r_cnt
    }
    w = {}
    for i, _, b in toks:
        n, s = w.get(i, (0, 0))
        w[i] = (n + 1, s + score[b])
    return {i: (n, s, s // n) for i, (n, s) in w.items()}


def test_dsir_favors_target_vocabulary(spark):
    """Docs written in the target language's vocabulary outrank docs in
    off-target vocabulary, regardless of the doc's own lang label."""
    rows = (
        [("alpha alpha beta", "en")] * 3
        + [("gamma delta gamma", "de")] * 3
        # an off-target doc USING target vocabulary still scores high —
        # DSIR scores content against the target distribution, not labels
        + [("alpha beta alpha", "fr")]
    )
    out = dsir_select(_docs(spark, rows)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[6]["weight_per_token"] == by_id[0]["weight_per_token"]
    assert by_id[0]["weight_per_token"] > by_id[3]["weight_per_token"]
    # ordering: weight_per_token DESC, then doc_id ASC
    wpts = [(r["weight_per_token"], -r["doc_id"]) for r in out]
    assert wpts == sorted(wpts, reverse=True)


def test_dsir_matches_python_replication(spark):
    """Every (n_terms, weight, weight_per_token) matches the pure-Python
    replication of the hash/score/sum chain, and token-free docs drop."""
    rows = [
        ("the quick brown fox", "en"),
        ("der schnelle braune fuchs", "de"),
        ("the lazy dog sleeps", "en"),
        ("le renard brun rapide", "fr"),
        ("12345 67890 !!!", "en"),  # no [a-z] tokens -> absent
        ("quick quick quick", "zh"),
    ]
    exp = _py_weights(rows)
    out = {r["doc_id"]: r for r in dsir_select(_docs(spark, rows)).collect()}
    assert set(out) == set(exp)  # doc 4 absent from both
    for i, (n, s, wpt) in exp.items():
        assert out[i]["n_terms"] == n
        assert out[i]["weight"] == s
        assert out[i]["weight_per_token"] == wpt


def test_dsir_all_target_scores_uniform(spark):
    """With a single-language corpus the target and raw distributions
    coincide: every bucket score collapses toward the same ratio and
    every doc's weight is n_terms x that per-bucket score."""
    rows = [("alpha beta", "en"), ("alpha beta", "en")]
    out = dsir_select(_docs(spark, rows)).collect()
    assert len(out) == 2
    # t_cnt == r_cnt per bucket and t_tot == r_tot -> identical smoothed
    # ratios -> both docs tie; tie-break is doc_id ASC
    assert out[0]["doc_id"] == 0 and out[1]["doc_id"] == 1
    assert out[0]["weight"] == out[1]["weight"]
