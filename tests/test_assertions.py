"""NegEx-style assertion detection (operators/assertions.py) and sliced
metrics (operators/metrics.py::micro_prf_by_group): hand-checked windows
and per-group count arithmetic."""

from __future__ import annotations

from ehr_ner_spark.operators.assertions import mention_assertions
from ehr_ner_spark.operators.metrics import micro_prf_by_group


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, content string",
    )


def test_assertion_window(spark):
    # gold vocab: 'scan' (T_SCAN/T_IO); cue 'slow'
    out = mention_assertions(_corpus(spark, [
        "slow scan",                  # cue 1 before -> negated
        "slow a b scan",              # cue 3 before -> negated (window 3)
        "slow a b c scan",            # cue 4 before -> NOT negated
        "scan slow",                  # cue after -> NOT negated
    ])).collect()
    flags = {(r["pid"], r["start_pos"]): r["negated"] for r in out
             if r["type"] == "T_SCAN"}
    assert flags[(0, 1)] == 1
    assert flags[(1, 3)] == 1
    assert flags[(2, 4)] == 0
    assert flags[(3, 0)] == 0


def test_assertion_preserves_span_algebra(spark):
    # both types sharing the surface 'scan' get the same flag
    out = mention_assertions(_corpus(spark, ["slow scan"])).collect()
    types = {r["type"]: r["negated"] for r in out}
    assert types == {"T_SCAN": 1, "T_IO": 1}


def test_metrics_by_group_hand_case(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "pid long, type string, start_pos long, end_pos long, text string")
    gold = mk([(1, "A", 0, 0, "x"), (1, "A", 2, 2, "y"), (2, "A", 0, 0, "z")])
    pred = mk([(1, "A", 0, 0, "x"), (2, "A", 5, 5, "w")])
    groups = spark.createDataFrame(
        [(1, "g1"), (2, "g2")], "pid long, grp string")
    out = {r["grp"]: r for r in
           micro_prf_by_group(gold, pred, groups).collect()}
    g1 = out["g1"]
    assert (g1["nb_correct"], g1["nb_pred"], g1["nb_true"]) == (1, 1, 2)
    assert (g1["precision"], g1["recall"]) == (1.0, 0.5)
    g2 = out["g2"]
    assert (g2["nb_correct"], g2["nb_pred"], g2["nb_true"]) == (0, 1, 1)
    assert g2["f1"] == 0.0


def test_metrics_by_group_empty_slice_reports(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "pid long, type string, start_pos long, end_pos long, text string")
    gold = mk([(1, "A", 0, 0, "x")])
    pred = mk([])
    groups = spark.createDataFrame([(1, "g1")], "pid long, grp string")
    r = micro_prf_by_group(gold, pred, groups).collect()[0]
    assert (r["nb_pred"], r["nb_true"], r["precision"], r["recall"]) == \
        (0, 1, 0.0, 0.0)
