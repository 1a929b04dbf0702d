"""Featurizer contract tests, modeled on the reference's shape tests
(/root/reference/tests/test_utils_sl.py:39-174): label map, 512-length
invariants, QASL bare-label painting, wordpiece label alignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.kernel.features import (
    PAD_TOKEN_LABEL_ID,
    featurize_qasl,
    get_labels,
    paint_labels_qasl,
    paint_labels_sl,
)
from ehr_ner_spark.kernel.wordpiece import tokenize_text
from ehr_ner_spark.operators.featurize import QASL_LABEL_MAP, featurize_corpus


def test_get_labels_prepends_O():
    labs, m = get_labels(["B", "I"])
    assert labs == ["O", "B", "I"] and m["O"] == 0
    labs2, _ = get_labels(["O", "B"])
    assert labs2 == ["O", "B"]


def test_paint_sl_and_qasl():
    spans = [("ADD", 1, 2), ("DCD", 4, 4)]
    assert paint_labels_sl(6, spans) == ["O", "B-ADD", "I-ADD", "O", "B-DCD", "O"]
    assert paint_labels_qasl(6, spans, "ADD") == ["O", "B", "I", "O", "O", "O"]
    assert paint_labels_qasl(6, spans, "DCD") == ["O", "O", "O", "O", "B", "O"]
    assert paint_labels_qasl(6, spans, "SGN") == ["O"] * 6


def test_featurize_lengths_and_alignment():
    q = tokenize_text("入院日期")
    passage = ["short", "verylongtoken", "x"]
    labels = ["B", "I", "O"]
    f = featurize_qasl(q, passage, labels, QASL_LABEL_MAP, max_seq_length=64)
    assert all(len(f[k]) == 64 for k in f)
    # [CLS] + 4 query chars + [SEP] -> passage starts at index 6
    n_prefix = 1 + len(q) + 1
    assert f["label_ids"][:n_prefix] == [PAD_TOKEN_LABEL_ID] * n_prefix
    # 'short' (<=4+1 chars -> 2 pieces: 'shor','##t'): head keeps B, cont -100
    assert f["label_ids"][n_prefix] == QASL_LABEL_MAP["B"]
    assert f["label_ids"][n_prefix + 1] == PAD_TOKEN_LABEL_ID
    # segment ids: 0 for query side, 1 for passage side
    assert f["token_type_ids"][0] == 0 and f["token_type_ids"][n_prefix] == 1
    # mask covers exactly the unpadded region
    n_real = sum(f["attention_mask"])
    assert f["input_ids"][n_real - 1] != 0 and f["input_ids"][n_real] == 0


def test_truncation_invariant():
    q = tokenize_text("入院日期")
    passage = ["tok"] * 1000
    labels = ["O"] * 1000
    f = featurize_qasl(q, passage, labels, QASL_LABEL_MAP, max_seq_length=128)
    assert all(len(f[k]) == 128 for k in f)
    assert sum(f["attention_mask"]) == 128  # fully occupied after truncation


def test_featurize_corpus_spark(spark, sf_dir):
    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.operators.gold import GOLD_VOCAB, gold_mentions

    c = corpus(spark, sf_dir).limit(12)
    g = gold_mentions(c)
    battery = {t: f"find {t}" for t in GOLD_VOCAB}  # tags match gold types
    feats = featurize_corpus(c, gold_spans=g, queries=battery, max_seq_length=256)
    rows = feats.collect()
    assert len(rows) == 12 * len(battery)
    for r in rows[:50]:
        assert len(r.input_ids) == 256
        assert len(r.label_ids) == 256
        assert sum(r.attention_mask) > 0
    # painted labels exist for queries whose type has gold spans
    painted = [
        r for r in rows
        if any(l == QASL_LABEL_MAP["B"] for l in r.label_ids)
    ]
    assert painted  # gold vocab tokens occur in the corpus
