"""JSONL PERMISSIVE ingest + ORC round-trip (io/formats.py).

Oracle parity runs through tests/driver_compare.py; here the corrupt-line
audit semantics are pinned on a hand-built frame, including a document
whose text embeds a newline (JSON escaping must keep it one JSONL line).
"""

from __future__ import annotations

from pyspark.sql import Row

from ehr_ner_spark.io.formats import jsonl_ingest_audit


def test_jsonl_ingest_audits_corrupt_and_escapes_newlines(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="plain", lang="en"),
            # embedded newline: to_json must escape it so the record stays
            # a single JSONL line and parses back intact
            Row(doc_id=2, text="line one\nline two", lang="en"),
            Row(doc_id=3, text="hola", lang="es"),
            # doc_id % 10 == 0 -> truncated on write -> corrupt on read
            Row(doc_id=10, text="will be truncated", lang="es"),
            Row(doc_id=20, text="also truncated", lang="en"),
        ]
    )
    out = {r.lang: r for r in jsonl_ingest_audit(docs).collect()}
    assert out["_corrupt"].n_rows == 2
    assert out["_corrupt"].sum_chars == 0
    assert out["en"].n_rows == 2
    # the newline survives the round trip as one char of the parsed text
    assert out["en"].sum_chars == len("plain") + len("line one\nline two")
    assert out["es"].n_rows == 1 and out["es"].sum_chars == 4
