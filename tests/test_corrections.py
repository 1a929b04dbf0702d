"""J4 corrections merge (human-review loop, df2qasl.py semantics)."""

from __future__ import annotations

import pytest

from ehr_ner_spark.operators.priority import apply_corrections


def test_apply_corrections(spark):
    spans = spark.createDataFrame(
        [
            (0, "ADD", 1, 2, "ab"),
            (0, "DCD", 4, 4, "c"),
            (1, "SGN", 0, 1, "xy"),
        ],
        "pid long, type string, start_pos int, end_pos int, text string",
    )
    corr = spark.createDataFrame(
        [
            (0, "ADD", 1, 2, "drop", None),        # reviewer rejected
            (0, "DCD", 4, 4, "retype", "OCD"),     # reviewer retyped
        ],
        "pid long, type string, start_pos int, end_pos int,"
        " action string, new_type string",
    )
    out = {(r.pid, r.type, r.start_pos, r.end_pos) for r in
           apply_corrections(spans, corr).collect()}
    assert out == {(0, "OCD", 4, 4), (1, "SGN", 0, 1)}
