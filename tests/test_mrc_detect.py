"""U4 MRC span extraction: decode-rule unit tests + Spark/kernel parity."""

from __future__ import annotations

import numpy as np

from ehr_ner_spark.hashing import md5_60
from ehr_ner_spark.operators.mrc_detect import (
    END_T,
    MAX_SPAN,
    START_T,
    mrc_spans_doc,
)


def _flags(tag, tokens):
    h = np.array([md5_60(f"{tag}|mrc|{t}") for t in tokens], dtype=np.uint64)
    u_s = (h % 997).astype(np.float64) / 997.0
    u_e = ((h >> 10) % 991).astype(np.float64) / 991.0
    return u_s > START_T, u_e > END_T


def _reference_decode(tag, tokens, pid=0):
    """Sequential re-derivation: each start matches the nearest end at or
    after it; spans longer than the cap are dropped."""
    is_s, is_e = _flags(tag, tokens)
    ends = [i for i, f in enumerate(is_e) if f]
    out = []
    for s, f in enumerate(is_s):
        if not f:
            continue
        nxt = [e for e in ends if e >= s]
        if nxt and nxt[0] - s < MAX_SPAN:
            out.append((pid, tag, s, nxt[0], "".join(tokens[s : nxt[0] + 1])))
    return out


def test_mrc_kernel_matches_sequential_rederivation():
    import random

    rng = random.Random(42)
    vocab = ["病", "人", "2019", "x", "alpha", ",", "天", "入", "院", "q"]
    tags = ["ADD", "DCD", "SGN"]
    for trial in range(30):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(0, 80))]
        got = sorted(mrc_spans_doc(tags, tokens, pid=trial))
        expected = sorted(
            sp for tag in tags for sp in _reference_decode(tag, tokens, trial)
        )
        assert got == expected


def test_mrc_allows_nested_overlap_across_queries(spark, sf_dir):
    """Different queries may emit overlapping spans (the nested-NER point
    of the MRC formulation), and the Spark operator matches the kernel."""
    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.operators.mrc_detect import detect_mentions_mrc
    from ehr_ner_spark.kernel.wordpiece import tokenize_text
    from ehr_ner_spark.queries_battery import QUERIES

    c = corpus(spark, sf_dir).limit(40)
    got = sorted(
        (r.doc_id, r.type, r.start_pos, r.end_pos, r.text)
        for r in detect_mentions_mrc(c, num_partitions=4).collect()
    )
    tags = list(QUERIES.keys())
    expected = []
    for r in c.select("doc_id", "content").collect():
        expected.extend(
            mrc_spans_doc(tags, tokenize_text(r.content), pid=int(r.doc_id))
        )
    assert got == sorted(expected)
    # overlap check: some position is covered by spans of 2+ types
    cover: dict = {}
    for (d, t, s, e, _x) in got:
        for i in range(s, e + 1):
            cover.setdefault((d, i), set()).add(t)
    assert any(len(v) > 1 for v in cover.values())
