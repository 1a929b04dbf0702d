"""Metric semantics tests transcribed from the reference's asserted values
(/root/reference/utils/seqhelper/tests/test_entity.py:97-130, 174-184:
p=0.6667, r=0.5, f1=0.5714) plus report-shape checks."""

from __future__ import annotations

import pytest

from ehr_ner_spark.kernel.iob2 import decode_bio
from ehr_ner_spark.operators.metrics import classification_report, micro_prf

TRUES = [
    [("台", "B-LOC"), ("北", "I-LOC"), ("是", "O"), ("阿", "B-PER"),
     ("倫", "I-PER"), ("的", "O"), ("家", "O")],
    [("阿", "B-PER"), ("倫", "I-PER"), ("是", "O"), ("人", "B-ANI")],
]
PREDS = [
    [("台", "B-LOC"), ("北", "O"), ("是", "O"), ("阿", "B-PER"),
     ("倫", "I-PER"), ("的", "O"), ("家", "O")],
    [("阿", "B-PER"), ("倫", "I-PER"), ("是", "O"), ("人", "O")],
]


def _spans_df(spark, seqs):
    rows = []
    for pid, seq in enumerate(seqs):
        toks = [t for t, _ in seq]
        labs = [l for _, l in seq]
        rows.extend(decode_bio(toks, labs, pid=pid))
    return spark.createDataFrame(
        rows, "pid long, type string, start_pos int, end_pos int, text string"
    )


def test_micro_prf_reference_values(spark):
    g = _spans_df(spark, TRUES)
    p = _spans_df(spark, PREDS)
    row = micro_prf(g, p).collect()[0]
    assert round(row.precision, 4) == 0.6667
    assert round(row.recall, 4) == 0.5
    assert round(row.f1, 4) == 0.5714
    assert (row.nb_correct, row.nb_pred, row.nb_true) == (2, 3, 4)


def test_classification_report_shape(spark):
    g = _spans_df(spark, TRUES)
    p = _spans_df(spark, PREDS)
    rows = {r.label: r for r in classification_report(g, p).collect()}
    # union of types + micro/macro rows (eval.py:85-90)
    assert set(rows) == {"LOC", "PER", "ANI", "micro avg", "macro avg"}
    assert rows["PER"].precision == 1.0 and rows["PER"].recall == 1.0
    assert rows["LOC"].recall == 0.0 and rows["LOC"].support == 1
    assert rows["micro avg"].support == 4
    assert round(rows["micro avg"].f1, 4) == 0.5714
    # macro = unweighted mean over the 3 types
    assert round(rows["macro avg"].precision, 4) == round((0 + 1 + 0) / 3, 4)


def test_confidence_calibration_hand_case(spark):
    """4 (doc, type) confidences in two bins; gold flags make bin -1
    50% observed and bin -3 100%; clamping pulls -99 into the floor bin."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.metrics import confidence_calibration

    conf = spark.createDataFrame(
        [
            Row(doc_id=1, type="A", n_pieces=5, confidence=-0.25),
            Row(doc_id=2, type="A", n_pieces=5, confidence=-0.75),
            Row(doc_id=3, type="B", n_pieces=5, confidence=-2.5),
            Row(doc_id=4, type="B", n_pieces=5, confidence=-99.0),
        ]
    )
    gold = spark.createDataFrame(
        [
            Row(pid=1, type="A", start_pos=0, end_pos=1, text="x"),
            Row(pid=1, type="A", start_pos=3, end_pos=4, text="y"),  # dup flag
            Row(pid=3, type="B", start_pos=0, end_pos=1, text="z"),
        ]
    )
    got = {r.bin: r for r in confidence_calibration(conf, gold).collect()}
    assert got[-1].n == 2 and got[-1].n_hit == 1 and got[-1].observed_bp == 5000
    assert got[-3].n == 1 and got[-3].n_hit == 1 and got[-3].observed_bp == 10000
    assert got[-10].n == 1 and got[-10].n_hit == 0 and got[-10].observed_bp == 0
