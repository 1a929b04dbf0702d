"""Unit + plan tests for the session-13b batch: golden-record
survivorship, sweep-line concurrency profile, and centroid silhouette."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ehr_ner_spark import entrypoints


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_golden_record_field_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaaa", "en", 4),
            (2, "bbbbbb", "de", 6),
            (3, "cccccc", "de", 6),
            (9, "zz", "fr", 2),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (9, 200)],
        "doc_id long, component long",
    )
    from ehr_ner_spark.operators.survivorship import golden_records

    rows = {r["component"]: r for r in golden_records(docs, clusters).collect()}
    g = rows[100]
    assert g["n_members"] == 3
    assert g["rep_doc_id"] == 1  # canonical id = min
    # longest text ties (2, 3) -> min doc_id
    assert g["longest_doc_id"] == 2 and g["longest_len"] == 6
    # majority lang: de (2 votes) beats en
    assert g["major_lang"] == "de"
    assert g["max_n_chars"] == 6
    s = rows[200]
    assert s["n_members"] == 1 and s["rep_doc_id"] == 9
    assert s["major_lang"] == "fr"


def test_golden_record_has_no_window_sort(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["ds_golden_record"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" not in plan  # elections are combinable aggregates


def test_concurrency_profile_known_values(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0, 7),                                  # opens 10:00
        (2, t0 + dt.timedelta(seconds=60), 8),        # overlaps -> 2 open
        (3, t0 + dt.timedelta(seconds=400), 9),       # 1 closed by then
        (4, t0 + dt.timedelta(hours=2), 10),          # isolated hour
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    from ehr_ner_spark.operators.sweepline import concurrency_profile

    out = {r["hour"]: r for r in concurrency_profile(ev).collect()}
    h10 = out[t0]
    assert h10["n_opens"] == 3
    # events 1+2 overlap (2 concurrent); event 3 starts at +400s after
    # event 1 closed (+300s) but while event 2 is open (+360s candidate
    # close) -> max is 2
    assert h10["max_concurrency"] == 2
    h12 = out[t0 + dt.timedelta(hours=2)]
    assert h12["max_concurrency"] == 1


def test_concurrency_carry_crosses_hours(spark):
    # an interval opened at 10:59:59 is still open at 11:00 — the cross-
    # bucket carry must propagate it into hour 11's baseline
    t = dt.datetime(2024, 1, 1, 10, 59, 59)
    ev = spark.createDataFrame(
        [(1, t, 1), (2, t + dt.timedelta(seconds=120), 2)],
        "event_id long, ts timestamp, user_id long",
    )
    from ehr_ner_spark.operators.sweepline import concurrency_profile

    out = {r["hour"]: r for r in concurrency_profile(ev).collect()}
    h11 = out[dt.datetime(2024, 1, 1, 11, 0, 0)]
    assert h11["max_concurrency"] == 2  # carry 1 + open at 11:01:59


def test_concurrency_profile_single_scan(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["rel_concurrency_profile"](spark, sf_dir)
    plan = _plan(df)
    # open+close marks come from ONE events scan via an inline generator,
    # not a UNION ALL re-scan
    assert plan.count("Scan parquet") == 1
    assert "Generate" in plan


def test_silhouette_separated_clusters_score_high(spark):
    rows = []
    for i in range(6):
        rows.append((i, [0.0, 0.0, float(i % 3) * 0.01], 0))
    for i in range(6, 12):
        rows.append((i, [10.0, 10.0, float(i % 3) * 0.01], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from ehr_ner_spark.operators.silhouette import silhouette_by_label

    out = {r["label"]: r for r in silhouette_by_label(emb).collect()}
    assert out[0]["n_vecs"] == 6 and out[1]["n_vecs"] == 6
    assert out[0]["mean_silhouette"] > 0.99
    assert out[1]["mean_silhouette"] > 0.99


def test_silhouette_centroids_broadcast(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["ds_silhouette"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # distances are JVM folds
    rows = df.collect()
    assert len(rows) == 10
    assert all(-1.0 <= r["mean_silhouette"] <= 1.0 for r in rows)
