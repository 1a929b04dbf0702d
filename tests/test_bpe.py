"""BPE training/encoding vs a pure-Python Sennrich (2016) reference."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from ehr_ner_spark.operators.bpe import (
    BPE_EOW,
    BPE_FIXED_MERGES,
    bpe_encode,
    bpe_merges,
    bpe_merges_sql,
)


def _words(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    freq = Counter()
    for (text,) in rows:
        for w in text.split():
            if w.isalpha() and w.islower() and w.isascii():
                freq[w] += 1
    return freq


def _py_train(freq: Counter, rounds: int):
    """Reference trainer: argmax adjacent pair (count desc, then lexico),
    greedy left-to-right non-overlapping rewrite."""
    vocab = {w: list(w) + [BPE_EOW] for w in freq}
    merges = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        for w, syms in vocab.items():
            vocab[w] = _py_merge(syms, a, b)
    return merges, vocab


def _py_merge(syms, a, b):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_merges_matches_python_reference(spark, sf_dir):
    freq = _words(sf_dir)
    want, _ = _py_train(freq, 6)
    got = sorted(
        map(tuple, bpe_merges(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect())
    )
    assert got == sorted(want)


def test_bpe_merges_checkpoint_off_same_answer(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, bpe_merges(df, rounds=3, checkpoint=True).collect()))
    b = sorted(map(tuple, bpe_merges(df, rounds=3, checkpoint=False).collect()))
    assert a == b and len(a) == 3


def test_fixed_merges_are_what_sf0001_learns(spark):
    got = [
        (r.lhs, r.rhs)
        for r in sorted(
            bpe_merges(
                spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            ).collect(),
            key=lambda r: r.round,
        )
    ]
    assert got == BPE_FIXED_MERGES


def test_bpe_encode_matches_python_replay(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    want = {}
    for doc_id, text in rows:
        nw = nt = 0
        for w in text.split():
            if not (w.isalpha() and w.islower() and w.isascii()):
                continue
            syms = list(w) + [BPE_EOW]
            for a, b in BPE_FIXED_MERGES:
                syms = _py_merge(syms, a, b)
            nw += 1
            nt += len(syms)
        if nw:
            want[doc_id] = (nw, nt)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_encode(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            BPE_FIXED_MERGES,
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "syms,a,b",
    [
        (["a", "a", "a", "a"], "a", "a"),  # overlap chain: greedy pairs
        (["a", "a", "a"], "a", "a"),       # odd tail survives
        (["b", "a", "ab"], "a", "b"),      # pair inside a longer symbol: no
        (["ab", "a", "b"], "a", "b"),      # merged symbol as neighbor
    ],
)
def test_framed_replace_equals_greedy_merge(spark, syms, a, b):
    """The |-framed literal replace IS the greedy left-to-right merge."""
    framed = "|" + "||".join(syms) + "|"
    replaced = framed.replace(f"|{a}||{b}|", f"|{a}{b}|")
    got = replaced[1:-1].split("||")
    assert got == _py_merge(syms, a, b)
