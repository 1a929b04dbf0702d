"""Fuzzy alias blocking (operators/fuzzy.py): hand-checked candidate
generation, the lossless-within-budget blocking property, and the
distance filter."""

from __future__ import annotations

from ehr_ner_spark.operators.fuzzy import fuzzy_alias_pairs


def _mentions(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_case(spark):
    out = fuzzy_alias_pairs(_mentions(spark, [
        "aspirin", "asprin",       # dist 1, same block family
        "aspirin",                 # repeated mention -> n_a = 2
        "bspirin",                 # dist 1 from aspirin but first char differs
        "zzz",
    ])).collect()
    pairs = {(r["text_a"], r["text_b"]): r for r in out}
    assert ("asprin", "aspirin") in pairs or ("aspirin", "asprin") in pairs
    key = ("asprin", "aspirin") if ("asprin", "aspirin") in pairs \
        else ("aspirin", "asprin")
    r = pairs[key]
    assert r["dist"] == 1
    assert {r["n_a"], r["n_b"]} == {1, 2}
    # blocked out: differing first char is a documented recall tradeoff
    assert all("bspirin" not in k for k in pairs)


def test_length_gap_two_is_caught_and_three_is_not(spark):
    out = fuzzy_alias_pairs(_mentions(spark, ["ab", "abxy", "abxyz"])).collect()
    pairs = {(r["text_a"], r["text_b"]) for r in out}
    assert ("ab", "abxy") in pairs          # dist 2, len gap 2
    assert ("abxy", "abxyz") in pairs       # dist 1
    assert ("ab", "abxyz") not in pairs     # dist 3 > budget


def test_pairs_unique_and_ordered(spark):
    out = fuzzy_alias_pairs(_mentions(spark, ["cat", "cap", "car"])).collect()
    keys = [(r["text_a"], r["text_b"]) for r in out]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    assert len(keys) == 3                   # all three pairwise dist-1
