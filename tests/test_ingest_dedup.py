"""Unit + plan tests for the session-13c batch: incremental ingest dedup
and entity trend."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_ner_spark import entrypoints


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_incremental_dedup_finds_known_duplicates(spark):
    base_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (3, base_text),                        # base (3 % 10 != 0)
        (7, "an entirely different sentence about spark shuffles"),
        (10, base_text),                       # batch exact dup of 3
        (20, base_text + " x"),                # batch near-dup of 3
        (30, "zz completely novel content never seen in the corpus qq"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from ehr_ner_spark.operators.dedup import incremental_dedup

    out = {r["doc_id"]: r for r in incremental_dedup(docs, 0.6).collect()}
    assert 10 in out and out[10]["dup_of"] == 3
    assert out[10]["jaccard"] == 1.0
    assert 20 in out and out[20]["dup_of"] == 3
    assert 0.6 <= out[20]["jaccard"] < 1.0
    assert 30 not in out  # novel batch doc is not reported
    assert 3 not in out and 7 not in out  # base docs never reported


def test_incremental_dedup_broadcasts_the_batch_side(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["ds_incremental_dedup"](spark, sf_dir)
    plan = _plan(df)
    # the batch band frame probes the corpus via broadcast — the corpus
    # band frame is never self-joined
    assert "BroadcastHashJoin" in plan


def test_entity_trend_signs(spark):
    # max doc_id pinned to 799 -> bucket = doc_id // 100.
    # "up" has 2*b mentions in bucket b (rising); "down" mirrored (falling);
    # "steady" has 3 everywhere (flat, slope exactly 0).
    rows = [(799, "steady")]
    for b in range(8):
        rows += [(b * 100 + i, "up") for i in range(2 * b)]
        rows += [(b * 100 + 50 + i, "down") for i in range(2 * (7 - b))]
        rows += [(b * 100 + 90 + i, "steady") for i in range(3 if b < 7 else 2)]
    m = spark.createDataFrame(rows, "doc_id long, text string")
    from ehr_ner_spark.operators.trend import entity_trend

    out = {r["text"]: r for r in entity_trend(m, min_total=1).collect()}
    assert out["up"]["trend"] == "rising" and out["up"]["slope"] == 2.0
    assert out["down"]["trend"] == "falling" and out["down"]["slope"] == -2.0
    assert out["steady"]["trend"] == "flat" and out["steady"]["slope"] == 0.0


def test_entity_trend_zero_fill_matters(spark):
    # an entity attested in ONE bucket only: without the dense zero fill
    # its slope would be undefined (a single x value); with the fill it is
    # well-defined and falling-or-rising depending on the bucket position
    m = spark.createDataFrame(
        [(700 + i, "spike") for i in range(30)] + [(10, "pad")],
        "doc_id long, text string",
    )
    from ehr_ner_spark.operators.trend import entity_trend

    out = {r["text"]: r for r in entity_trend(m, min_total=5).collect()}
    assert out["spike"]["trend"] == "rising"  # mass in the last bucket
    assert out["spike"]["n_total"] == 30
