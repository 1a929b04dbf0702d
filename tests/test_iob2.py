"""IOB2 decode kernel tests.

The parametrized cases transcribe the reference's own truth-table and golden
tests (/root/reference/utils/seqhelper/tests/test_entity.py:24-130) plus
adversarial boundary cases for the places SURVEY.md §7.4 flags as
divergence-prone (sentinel handling, invalid-transition repair, bare labels).
"""

from __future__ import annotations

import random

import pytest

from ehr_ner_spark.kernel.iob2 import decode_bio
from tests.reference_impl import oracle_decode

# Golden cases from test_entity.py:69-96 (token text uses the same CJK
# examples so the ""-join semantics are exercised on multibyte chars).
GOLDEN = [
    (
        [("台", "B-LOC"), ("北", "I-LOC"), ("是", "O"), ("阿", "B-PER"),
         ("倫", "I-PER"), ("的", "O"), ("家", "O")],
        [(0, "LOC", 0, 1, "台北"), (0, "PER", 3, 4, "阿倫")],
    ),
    (
        [("阿", "B-PER"), ("倫", "I-PER"), ("是", "O"), ("人", "B-ANI")],
        [(0, "PER", 0, 1, "阿倫"), (0, "ANI", 3, 3, "人")],
    ),
]

# Boundary / repair cases derived from the scheme tables (scheme.py:26-64).
EDGE = [
    # I after different type starts a new chunk (repair, scheme.py:53-57)
    ([("a", "B-X"), ("b", "I-Y")],
     [(0, "X", 0, 0, "a"), (0, "Y", 1, 1, "b")]),
    # I after O with a type starts a chunk ((O, I, DIFF) start)
    ([("a", "O"), ("b", "I-X")], [(0, "X", 1, 1, "b")]),
    # B B same type: two adjacent singleton chunks
    ([("a", "B-X"), ("b", "B-X")],
     [(0, "X", 0, 0, "a"), (0, "X", 1, 1, "b")]),
    # chunk at sequence end is closed by the sentinel
    ([("a", "O"), ("b", "B-X"), ("c", "I-X")], [(0, "X", 1, 2, "bc")]),
    # entire sequence is one chunk
    ([("a", "B-X"), ("b", "I-X"), ("c", "I-X")], [(0, "X", 0, 2, "abc")]),
    # empty and all-O sequences
    ([], []),
    ([("a", "O"), ("b", "O")], []),
    # type containing the delimiter: split(maxsplit=1) keeps the tail
    ([("a", "B-X-Y"), ("b", "I-X-Y")], [(0, "X-Y", 0, 1, "ab")]),
]


@pytest.mark.parametrize("seq, expected", GOLDEN + EDGE)
def test_decode_golden(seq, expected):
    toks = [t for t, _ in seq]
    labs = [l for _, l in seq]
    assert decode_bio(toks, labs, pid=0) == expected
    assert oracle_decode(toks, labs, pid=0) == expected


def test_decode_property_vs_oracle():
    """Vectorized kernel == sequential automaton on random label soups,
    including bare B/I labels (empty type) and repair transitions."""
    rng = random.Random(1234)
    labels_pool = ["O", "B-X", "I-X", "B-Y", "I-Y", "B", "I", "B-LOC", "I-LOC"]
    for trial in range(500):
        n = rng.randint(0, 24)
        toks = [rng.choice("abcdef") for _ in range(n)]
        labs = [rng.choice(labels_pool) for _ in range(n)]
        assert decode_bio(toks, labs, pid=trial) == oracle_decode(toks, labs, pid=trial), (
            toks, labs,
        )


def test_decode_uniform_fast_path_vs_general():
    """decode_bio_uniform == decode_bio with synthesized uniform labels,
    over random tag soups (the QASL battery always decodes uniform types)."""
    import numpy as np

    from ehr_ner_spark.kernel.iob2 import decode_bio_uniform

    rng = random.Random(99)
    for trial in range(400):
        n = rng.randint(0, 20)
        toks = [rng.choice("abcd") for _ in range(n)]
        tags = [rng.choice("BIO") for _ in range(n)]
        labels = [f"{t}-QT" if t != "O" else "O" for t in tags]
        fast = decode_bio_uniform(toks, np.array(tags, dtype="U1"), "QT", pid=trial)
        assert fast == decode_bio(toks, labels, pid=trial), (toks, tags)


def test_battery_fast_path_vs_per_query():
    """predict_battery == looped predict_one_query (set equality) on real
    corpus docs — the optimization must not change a single span."""
    import duckdb

    from ehr_ner_spark.kernel.predict import predict_battery, predict_one_query
    from ehr_ner_spark.kernel.scorer import DeterministicQAScorer
    from ehr_ner_spark.kernel.wordpiece import tokenize_text
    from ehr_ner_spark.queries_battery import QUERIES

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 40"
    ).fetchall()
    battery = [(t, tokenize_text(q)) for t, q in QUERIES.items()]
    s = DeterministicQAScorer()
    for did, text in rows:
        pt = tokenize_text(text)
        fast = set(predict_battery(s, battery, pt, pid=did))
        slow = set()
        for tag, qt in battery:
            slow.update(predict_one_query(s, tag, qt, pt, pid=did))
        assert fast == slow, did


def test_nested_list_pid_enumeration():
    """EntityFromNestedList semantics (entity.py:22-31): pid = enumerate idx."""
    seqs = [GOLDEN[0][0], GOLDEN[1][0]]
    out = [decode_bio([t for t, _ in s], [l for _, l in s], pid=i)
           for i, s in enumerate(seqs)]
    assert out[0] == [(0, "LOC", 0, 1, "台北"), (0, "PER", 3, 4, "阿倫")]
    assert out[1] == [(1, "PER", 0, 1, "阿倫"), (1, "ANI", 3, 3, "人")]
