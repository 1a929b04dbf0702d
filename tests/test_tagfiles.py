"""S3 tag-file reader / S9 predictions sink / A3-A4 token metrics tests
(golden values from the reference's seqeval docstring example,
metrics_sl.py:251-256)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.io.tagfiles import (
    read_tag_file,
    tokens_to_sequences,
    write_predictions,
)
from ehr_ner_spark.operators.metrics import token_accuracy, token_confusion

TAG_TEXT = "民 B-ADD\n國 I-ADD\n\n手 B-SGN\n術 I-SGN\n後 O\n"


@pytest.fixture(scope="module")
def tag_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("tags") / "dev.txt"
    p.write_text(TAG_TEXT, encoding="utf-8")
    return read_tag_file(spark, str(p))


def test_read_tag_file(tag_df):
    rows = {(r.pid, r.pos): (r.token, r.label) for r in tag_df.collect()}
    assert rows[(0, 0)] == ("民", "B-ADD")
    assert rows[(0, 1)] == ("國", "I-ADD")
    assert rows[(1, 2)] == ("後", "O")
    assert len(rows) == 5


def test_tokens_to_sequences(tag_df):
    seqs = {r.pid: (r.tokens, r.labels) for r in tokens_to_sequences(tag_df).collect()}
    assert seqs[0] == (["民", "國"], ["B-ADD", "I-ADD"])
    assert seqs[1] == (["手", "術", "後"], ["B-SGN", "I-SGN", "O"])


def _label_df(spark, seqs):
    rows = []
    for pid, labels in enumerate(seqs):
        for pos, lab in enumerate(labels):
            rows.append((pid, pos, f"t{pos}", lab))
    return spark.createDataFrame(rows, "pid long, pos int, token string, label string")


SEQEVAL_TRUE = [["O", "O", "O", "B-MISC", "I-MISC", "O", "B-ORG"], ["B-PER", "I-PER", "O", "B-PER"]]
SEQEVAL_PRED = [["O", "O", "B-MISC", "I-MISC", "I-MISC", "O", "O"], ["B-PER", "I-PER", "O", "B-MISC"]]


def test_token_confusion_reference_example(spark):
    g = _label_df(spark, SEQEVAL_TRUE)
    p = _label_df(spark, SEQEVAL_PRED)
    row = token_confusion(g, p).collect()[0]
    # metrics_sl.py:255-256 docstring golden values
    assert (row.TP, row.FP, row.FN, row.TN) == (3, 3, 1, 4)


def test_token_accuracy(spark):
    g = _label_df(spark, SEQEVAL_TRUE)
    p = _label_df(spark, SEQEVAL_PRED)
    row = token_accuracy(g, p).collect()[0]
    assert row.nb_tokens == 11
    assert row.accuracy == round(7 / 11, 6)


def test_write_predictions_padding(spark, tmp_path):
    g = _label_df(spark, [["B-X", "I-X", "O"]])
    p = _label_df(spark, [["B-X", "I-X"]])  # last position unpredicted
    out = str(tmp_path / "preds")
    write_predictions(g, p, out)
    lines = [r.value for r in spark.read.text(out).collect()]
    assert lines == ["t0 B-X B-X", "t1 I-X I-X", "t2 O no prediction"]


def test_paint_flat_labels_bio():
    """paint_flat_labels: B at span start, I inside, O elsewhere; extra
    position columns (e.g. the token text for the S9 sink) pass through."""
    from pyspark.sql import SparkSession

    from ehr_ner_spark.operators.metrics import paint_flat_labels

    spark = SparkSession.getActiveSession()
    pos = spark.createDataFrame(
        [(0, p, f"t{p}") for p in range(5)] + [(1, 0, "x")],
        "pid long, pos int, token string",
    )
    spans = spark.createDataFrame(
        [(0, "ADD", 1, 3, "t1t2t3")],
        "pid long, type string, start_pos int, end_pos int, text string",
    )
    rows = {(r.pid, r.pos): (r.token, r.label)
            for r in paint_flat_labels(pos, spans).collect()}
    assert rows[(0, 0)] == ("t0", "O")
    assert rows[(0, 1)] == ("t1", "B-ADD")
    assert rows[(0, 2)] == ("t2", "I-ADD")
    assert rows[(0, 3)] == ("t3", "I-ADD")
    assert rows[(0, 4)] == ("t4", "O")
    assert rows[(1, 0)] == ("x", "O")
    assert len(rows) == 6
