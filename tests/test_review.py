"""S8 review round-trip: serialize -> (sheet file) -> parse == identity,
with the reference's exact cell format and greedy-regex parse semantics."""

from __future__ import annotations

import re

import pytest

REF_RE = re.compile(r"\[(.+)\]\[(.+)\]\[(\d+)-(\d+)\]")  # dataTransformer.py:155

SPANS = [
    (0, "T_SCAN", 2, 2, "scan"),
    (0, "T_JOIN", 5, 6, "join merge"),
    (1, "ADD", 0, 3, "2019年3月"),
    (2, "X", 1, 1, "a,b"),      # comma inside text survives the ",\n" join
]


@pytest.fixture(scope="module")
def spans_df(spark):
    return spark.createDataFrame(
        SPANS, "pid long, type string, start_pos int, end_pos int, text string"
    )


def test_serialize_matches_reference_format(spark, spans_df):
    from ehr_ner_spark.io.review import spans_to_review

    rows = {r.pid: r.flat_ne_answers for r in spans_to_review(spans_df).collect()}
    assert rows[1] == "[ADD][2019年3月][0-3]"
    # multi-answer cell: ",\n" joined, canonical (start,end,type) order
    assert rows[0] == "[T_SCAN][scan][2-2],\n[T_JOIN][join merge][5-6]"
    # every cell parses with the REFERENCE's own regex
    for cell in rows.values():
        for ans in cell.split(",\n"):
            assert REF_RE.search(ans)


def test_roundtrip_identity(spark, spans_df):
    from ehr_ner_spark.io.review import review_to_spans, spans_to_review

    back = review_to_spans(spans_to_review(spans_df)).collect()
    got = sorted((r.pid, r.type, r.start_pos, r.end_pos, r.text) for r in back)
    assert got == sorted(SPANS)


def test_sheet_file_roundtrip(spark, spans_df, tmp_path):
    """write -> read the actual sheet artifact (CSV here; xlsx when
    openpyxl exists) -> parse -> identical spans."""
    from ehr_ner_spark.io.review import (
        read_review_sheet,
        review_to_spans,
        spans_to_review,
        write_review_sheet,
    )

    path = write_review_sheet(spans_to_review(spans_df), str(tmp_path / "review"))
    back = review_to_spans(read_review_sheet(spark, path)).collect()
    got = sorted((r.pid, r.type, r.start_pos, r.end_pos, r.text) for r in back)
    assert got == sorted(SPANS)


def test_mangled_rows_are_skipped_not_fatal(spark):
    from ehr_ner_spark.io.review import review_to_spans

    review = spark.createDataFrame(
        [(0, "[T][ok][1-2],\nnot an answer,\n[U][also ok][3-4]"), (1, "")],
        "pid long, flat_ne_answers string",
    )
    got = sorted(
        (r.pid, r.type, r.start_pos, r.end_pos, r.text)
        for r in review_to_spans(review).collect()
    )
    assert got == [(0, "T", 1, 2, "ok"), (0, "U", 3, 4, "also ok")]


def test_write_review_sheet_guards_corpus_sized_frames(spark, tmp_path):
    """The driver-side sink refuses frames beyond max_rows (a review sheet
    is a human artifact; corpus-sized data belongs in parquet)."""
    import pytest

    from ehr_ner_spark.io.review import write_review_sheet

    df = spark.range(50).selectExpr("id AS pid", "'x' AS answers")
    with pytest.raises(ValueError, match="max_rows"):
        write_review_sheet(df, str(tmp_path / "sheet"), max_rows=10)
    out = write_review_sheet(df, str(tmp_path / "sheet"), max_rows=100)
    assert out.endswith((".csv", ".xlsx"))
