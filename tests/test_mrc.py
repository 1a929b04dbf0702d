"""S2 MRC-JSON reader vs an independent re-derivation of
/root/reference/utils/mrc.py:104-147 semantics (incl. the substring filter
and is_impossible flag)."""

from __future__ import annotations

import json

import pytest

FIXTURE = {
    "version": "V3.0-test",
    "query": {"ADD": "入院日期", "DCD": "出院日期", "SGN": "手術名稱"},
    "data": [
        {
            "pid": 1,
            "passage": "病人於2019年3月1日入院",
            "passage_tokens": ["病", "人", "於", "2019", "年", "3", "月", "1", "日", "入", "院"],
            "answers": [
                {"text": "2019年3月1日", "label": "B-ADD", "start_pos": 3, "end_pos": 8},
                {"text": "胃切除", "label": "SGN", "start_pos": 0, "end_pos": 2},
            ],
        },
        {
            "pid": 2,
            "passage": "無任何日期",
            "passage_tokens": ["無", "任", "何", "日", "期"],
            "answers": [],
        },
    ],
}


@pytest.fixture(scope="module")
def mrc_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mrc") / "mrc_test.json"
    p.write_text(json.dumps(FIXTURE, ensure_ascii=False), encoding="utf-8")
    return str(p)


def _reference_examples(doc: dict):
    """Sequential re-derivation of read_examples_from_file (mrc.py:104-147)."""
    out = []
    for d in doc["data"]:
        for qid, (tag, question) in enumerate(doc["query"].items()):
            texts, starts, ends, impossible = [], [], [], True
            for a in d["answers"]:
                if tag in a["label"]:
                    texts.append(a["text"])
                    starts.append(a["start_pos"])
                    ends.append(a["end_pos"])
                    impossible = False
            out.append((
                f"{d['pid']}-{qid}", tag, question, d["passage"],
                tuple(d["passage_tokens"]), tuple(texts), tuple(starts),
                tuple(ends), impossible,
            ))
    return sorted(out)


def test_mrc_examples_match_reference(spark, mrc_path):
    from ehr_ner_spark.io.mrc import mrc_examples

    got = sorted(
        (r.qas_id, r.ner_category, r.question_text, r.passage_text,
         tuple(r.passage_tokens), tuple(r.answer_text_list),
         tuple(r.start_pos), tuple(r.end_pos), r.is_impossible)
        for r in mrc_examples(spark, mrc_path).collect()
    )
    assert got == _reference_examples(FIXTURE)
    # pid 1 x ADD: the substring rule matches 'B-ADD'; SGN matches bare 'SGN'
    by_id = {g[0]: g for g in got}
    assert by_id["1-0"][5] == ("2019年3月1日",) and not by_id["1-0"][8]
    assert by_id["1-2"][5] == ("胃切除",) and not by_id["1-2"][8]
    assert by_id["2-0"][8] is True  # no answers -> impossible


def test_mrc_queries_roundtrip(spark, mrc_path):
    from ehr_ner_spark.io.mrc import read_mrc_queries

    assert read_mrc_queries(spark, mrc_path) == FIXTURE["query"]
