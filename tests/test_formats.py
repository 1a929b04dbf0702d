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


def test_ntriples_escaping_roundtrip(spark):
    """Every N-Triples escape class (backslash, quote, LF, CR, TAB) is
    escaped per the grammar, and unescaping the emitted literal restores
    the original object text."""
    from ehr_ner_spark.io.formats import ntriples_lines

    objs = [
        'plain text',
        'has "quotes" inside',
        'back\\slash',
        'line\nbreak',
        'carriage\rreturn',
        'tab\there',
        '\\ all " of \n them \r at \t once \\',
    ]
    triples = spark.createDataFrame(
        [(f"doc:{i}", "hasEntityType:X", o) for i, o in enumerate(objs)],
        "subj string, pred string, obj string",
    )
    lines = [r.line for r in ntriples_lines(triples).collect()]
    assert len(lines) == len(objs)
    for line in lines:
        # grammar shape: IRI, IRI, quoted literal, dot
        assert line.startswith("<urn:doc:") and line.endswith('" .')
        body = line.split('> "', 1)[1][: -len('" .')]
        # no raw control chars survive in the serialized literal
        assert "\n" not in body and "\r" not in body and "\t" not in body
        # unescape (single pass, longest-match) must restore an original
        restored = (
            body.replace("\\\\", "\x00")
            .replace('\\"', '"')
            .replace("\\n", "\n")
            .replace("\\r", "\r")
            .replace("\\t", "\t")
            .replace("\x00", "\\")
        )
        assert restored in objs
