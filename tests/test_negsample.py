"""Negative sampling: dictionary index density, draw determinism, the
filtered-positive protocol, and NumPy-replayed draw parity (sf parity
lives in test_oracle_parity.py via kg_negative_samples)."""

from __future__ import annotations

import hashlib

import pytest

from ehr_ner_spark.operators.negsample import (
    entity_dictionary,
    negative_samples,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("d1", "hasDrug", "aspirin"),
        ("d1", "hasDrug", "warfarin"),
        ("d2", "hasDrug", "aspirin"),
        ("d2", "hasDisease", "diabetes"),
        ("d3", "hasDisease", "hypertension"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_dictionary_is_dense_and_hash_ordered(spark, triples):
    rows = entity_dictionary(triples).collect()
    idxs = sorted(r["idx"] for r in rows)
    assert idxs == list(range(4))  # dense 0..N-1, one per distinct obj
    # ordering replays (md5-bucket, entity)
    ordered = sorted(rows, key=lambda r: (int(_md5(r["ent"])[:2], 16), r["ent"]))
    assert [r["idx"] for r in ordered] == list(range(4))


def test_draws_deterministic_and_filtered(spark, triples):
    out = negative_samples(triples, k=3).collect()
    again = negative_samples(triples, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # the filtered protocol: a negative never equals its positive object
    assert all(r["neg_obj"] != r["obj"] for r in out)
    # replay one draw by hand
    dic = {r["idx"]: r["ent"]
           for r in entity_dictionary(triples).collect()}
    by_key = {(r["subj"], r["pred"], r["obj"], r["k"]): r["neg_obj"]
              for r in out}
    for (s, p, o, k), neg in by_key.items():
        want = dic[int(_md5(f"{s}|{p}|{o}|{k}")[:15], 16) % len(dic)]
        assert neg == want


def test_k_fanout_bound(spark, triples):
    out = negative_samples(triples, k=2).collect()
    # <= k rows per positive (fewer only when a draw hit the positive)
    from collections import Counter

    c = Counter((r["subj"], r["pred"], r["obj"]) for r in out)
    assert all(v <= 2 for v in c.values())
    assert {r["k"] for r in out} <= {1, 2}
