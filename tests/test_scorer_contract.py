"""The Scorer plug-point contract (SURVEY §7.2): pins the interface a
torch-backed implementation must satisfy before replacing the deterministic
scorer, and exercises the plug point with a second implementation."""

from __future__ import annotations

import pytest

from ehr_ner_spark.kernel.scorer import (
    BigramGateScorer,
    DeterministicQAScorer,
    verify_scorer_contract,
)
from ehr_ner_spark.queries_battery import QUERIES

TOKENS = (
    "patient took aspirin 100 mg twice daily for chronic back pain since "
    "2019 and metformin"
).split()
TAGS = list(QUERIES)[:5]


@pytest.mark.parametrize("factory", [DeterministicQAScorer, BigramGateScorer])
def test_scorer_conformance(factory):
    verify_scorer_contract(factory(), TAGS, TOKENS, fresh_factory=factory)


def test_contract_catches_locality_violation():
    """The checker must actually reject a scorer whose emissions depend on
    absolute position (the precondition the battery fast path needs)."""
    import numpy as np

    class PositionalScorer(BigramGateScorer):
        def logits(self, query_tag, tokens):
            lg = super().logits(query_tag, tokens)
            if len(tokens):
                lg[:, 0] += 0.01 * np.arange(len(tokens))
            return lg

    with pytest.raises(AssertionError, match="local"):
        verify_scorer_contract(
            PositionalScorer(), TAGS, TOKENS, fresh_factory=PositionalScorer
        )


def test_alternate_scorer_plugs_into_detect(spark, sf_dir):
    """The Spark plan is scorer-agnostic: swapping the factory changes which
    spans come out, not whether the pipeline runs.  Invariants: span text
    matches the token slice, and the default scorer's output is reproduced
    exactly when the default factory is passed explicitly."""
    from pyspark.sql import functions as F

    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.kernel.wordpiece import tokenize_text
    from ehr_ner_spark.operators.mention_detect import detect_mentions

    c = corpus(spark, sf_dir).limit(30)
    alt = detect_mentions(
        c, num_partitions=2, scorer_factory=BigramGateScorer
    ).collect()
    assert alt, "alternate scorer produced no mentions on 30 docs"

    docs = {r.doc_id: r.content for r in c.select("doc_id", "content").collect()}
    for r in alt[:200]:
        toks = tokenize_text(docs[r.doc_id])
        # ""-join: the reference's char-level span-render convention
        # (entity.py:84-91), same as test_span_text_invariant
        assert "".join(toks[r.start_pos : r.end_pos + 1]) == r.text

    default_explicit = detect_mentions(
        c, num_partitions=2, scorer_factory=DeterministicQAScorer
    )
    default_implicit = detect_mentions(c, num_partitions=2)
    key = lambda r: (r.doc_id, r.type, r.start_pos, r.end_pos, r.text)
    assert sorted(map(key, default_explicit.collect())) == sorted(
        map(key, default_implicit.collect())
    )
    # and the two scorers genuinely differ (the plug point is load-bearing)
    assert sorted(map(key, alt)) != sorted(map(key, default_implicit.collect()))
