"""Substring-span dedup, phrase search and quota sampling vs pure-Python
references (brute-force span merging / naive phrase scan / quota ranking)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import Row

from ehr_ner_spark.operators.sampling import SAMPLE_MOD, quota_sample
from ehr_ner_spark.operators.substring import (
    PHRASE,
    SPAN_WINDOW,
    phrase_search,
    substring_spans,
)

TOK = re.compile(r"[a-z]+")


def _toks(text: str) -> list[str]:
    return TOK.findall(text.lower())


def _ref_spans(docs: dict[int, str], w: int, df_cap: int = 10**9):
    """Brute-force reference: all matching w-windows, hot-window cap,
    merged along diagonals into maximal spans."""
    wins: dict[int, list[str]] = {
        d: [" ".join(t[i:i + w]) for i in range(len(t) - w + 1)]
        for d, t in ((d, _toks(x)) for d, x in docs.items())
        if len(t) >= w
    }
    dfreq: dict[str, set[int]] = {}
    for d, ws in wins.items():
        for s in ws:
            dfreq.setdefault(s, set()).add(d)
    hot = {s for s, ds in dfreq.items() if len(ds) > df_cap}
    hits: dict[tuple[int, int, int], list[int]] = {}
    ids = sorted(wins)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            for ia, sa in enumerate(wins[a]):
                if sa in hot:
                    continue
                for ib, sb in enumerate(wins[b]):
                    if sa == sb:
                        hits.setdefault((a, b, ia - ib), []).append(ia)
    spans = set()
    for (a, b, diag), poss in hits.items():
        poss = sorted(poss)
        start = prev = poss[0]
        for p in poss[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            spans.add((a, b, start, start - diag, prev - start + w))
            if p is not None:
                start = prev = p
    return spans


def _mk_docs():
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return {
        0: "intro words " + shared + " tail one",
        1: "other prefix " + shared + " closing",
        # doc 2 repeats the shared run twice -> two diagonals vs 0/1
        2: shared + " middle filler " + shared,
        3: "completely unrelated tokens nothing matches here at all ok",
        # doc 4 == doc 0 verbatim (exact duplicate -> full-length span)
        4: "intro words " + shared + " tail one",
    }


def test_substring_spans_match_bruteforce(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in sorted(docs.items())]
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in substring_spans(df, w=SPAN_WINDOW).collect()
    }
    assert got == _ref_spans(docs, SPAN_WINDOW)
    # the exact-duplicate pair (0, 4) merges to ONE full-length span
    full = [s for s in got if (s[0], s[1]) == (0, 4)]
    assert full == [(0, 4, 0, 0, len(_toks(docs[0])))]


def test_substring_spans_hot_window_cap(spark):
    # one boilerplate run shared by MANY docs is capped away; a rare pair
    # survives
    boiler = "one two three four five six seven eight nine ten"
    rare = "red orange yellow green blue indigo violet pink brown black"
    docs = {i: f"d{i} " + boiler for i in range(6)}
    docs[10] = "x " + rare
    docs[11] = "y " + rare
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in sorted(docs.items())]
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in substring_spans(df, w=8, df_cap=3).collect()
    }
    assert got == _ref_spans(docs, 8, df_cap=3)
    assert all(p[:2] == (10, 11) for p in got) and got


@pytest.mark.parametrize("phrase", [PHRASE, ("beta", "gamma"), ("alpha",)])
def test_phrase_search_matches_naive_scan(spark, phrase):
    docs = _mk_docs()
    docs[5] = "slow hash batch then slow hash batch again slow hash end"
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in sorted(docs.items())]
    )
    got = {(r.doc_id, r.match_pos) for r in phrase_search(df, phrase).collect()}
    want = set()
    for d, t in docs.items():
        toks = _toks(t)
        k = len(phrase)
        for i in range(len(toks) - k + 1):
            if tuple(toks[i:i + k]) == tuple(phrase):
                want.add((d, i))
    assert got == want
    if tuple(phrase) == PHRASE:
        # multi-occurrence doc found twice, truncated tail ("slow hash end")
        # not matched
        assert {(5, 0), (5, 4)} <= got and (5, 8) not in got


def test_quota_sample_counts_and_determinism(spark):
    rows = [
        Row(doc_id=i, lang=("en" if i % 3 == 0 else "fr" if i % 3 == 1 else "xx"))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows)
    quotas = {"en": 5, "fr": 100, "de": 4}  # fr quota exceeds stratum size
    out = quota_sample(df, quotas).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r)
    assert len(by.get("en", [])) == 5
    assert len(by.get("fr", [])) == 30  # min(quota, stratum size)
    assert "xx" not in by and "de" not in by  # no quota / empty stratum
    # rank order follows (sample_key, doc_id); keys match the shared
    # md5-60 discipline
    for stratum, rs in by.items():
        rs = sorted(rs, key=lambda r: r.rnk)
        keys = [(r.sample_key, r.doc_id) for r in rs]
        assert keys == sorted(keys)
        for r in rs:
            h = hashlib.md5(f"quota:{r.doc_id}".encode()).hexdigest()
            assert r.sample_key == int(h[:15], 16) % SAMPLE_MOD
    # deterministic across runs
    again = {(r.doc_id, r.stratum, r.rnk) for r in quota_sample(df, quotas).collect()}
    assert again == {(r.doc_id, r.stratum, r.rnk) for r in out}
