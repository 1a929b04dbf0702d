"""Session-11 batch: exact grouped statistics, the entropy gate, MIME
sniffing, and the native stream-stream join."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_grouped_corr_matches_numpy(spark, sf_dir):
    from ehr_ner_spark.operators.stats import grouped_corr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = {r["l_returnflag"]: r for r in grouped_corr(li).collect()}
    pdf = li.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    for flag, g in pdf.groupby("l_returnflag"):
        x = np.round(g["l_quantity"].to_numpy() * 100).astype(np.int64)
        y = np.round(g["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        want = np.corrcoef(x, y)[0, 1]
        got = out[flag]["corr"]
        assert got == pytest.approx(want, abs=1e-6)
        assert out[flag]["n"] == len(g)
        slope = np.polyfit(x.astype(float), y.astype(float), 1)[0]
        assert out[flag]["slope"] == pytest.approx(slope, rel=1e-6)


def test_histogram_partitions_the_table(spark, sf_dir):
    from ehr_ner_spark.operators.stats import (
        HIST_BUCKET_CENTS,
        equiwidth_histogram,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = equiwidth_histogram(li).collect()
    assert sum(r["n"] for r in rows) == li.count()
    total_cents = li.select(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    ).first()[0]
    assert sum(r["sum_cents"] for r in rows) == total_cents
    for r in rows:
        assert r["hi_dollars"] - r["lo_dollars"] == HIST_BUCKET_CENTS // 100
        assert r["lo_dollars"] == r["bucket"] * (HIST_BUCKET_CENTS // 100)


def test_char_entropy_known_values(spark):
    from ehr_ner_spark.operators.textops import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),           # 0 bits
            (2, "abababab"),           # 1 bit
            (3, "abcdabcd"),           # 2 bits
            (4, "abcdefgh" * 4),       # 3 bits
            (5, "abcdefghijklmnop" * 2),  # 4 bits
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert got[1]["entropy_bits"] == 0.0
    assert got[2]["entropy_bits"] == pytest.approx(1.0, abs=1e-6)
    assert got[3]["entropy_bits"] == pytest.approx(2.0, abs=1e-6)
    assert got[4]["entropy_bits"] == pytest.approx(3.0, abs=1e-6)
    assert got[5]["entropy_bits"] == pytest.approx(4.0, abs=1e-6)
    # gate: 3 bits sits below the 3.2-bit boilerplate cut; 4 bits is ok
    assert got[1]["entropy_gate"] == "low_entropy"
    assert got[4]["entropy_gate"] == "low_entropy"
    assert got[5]["entropy_gate"] == "ok"
    assert got[3]["n_distinct_chars"] == 4


def test_char_entropy_matches_scipy_formula(spark, sf_dir):
    from ehr_ner_spark.operators.textops import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        counts = {}
        for c in row["text"]:
            counts[c] = counts.get(c, 0) + 1
        n = len(row["text"])
        want = -sum(
            (c / n) * math.log2(c / n) for c in counts.values()
        )
        assert got[row["doc_id"]] == pytest.approx(want, abs=1e-6)


def test_char_entropy_plan_has_no_shuffle(spark, sf_dir):
    from ehr_ner_spark.operators.textops import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = char_entropy(docs)._jdf.queryExecution().executedPlan().toString()
    # map-only: the only allowed Exchange is the small-input fan-out
    # round-robin; no hash/range partitioning, no aggregate exchange
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mime_sniff_fault_classes(spark):
    from ehr_ner_spark.operators.multimodal import (
        JPEG_MOD,
        NO_MAGIC_MOD,
        sniff_mime,
        synth_media_magic,
    )

    rows = {
        r["media_id"]: r
        for r in sniff_mime(synth_media_magic(spark, 48)).collect()
    }
    for i, r in rows.items():
        kind = ["image", "audio", "video"][i % 3]
        if i % NO_MAGIC_MOD == 0:
            assert r["sniffed_mime"] == "application/octet-stream"
            assert not r["kind_matches"]
        elif i % JPEG_MOD == 0:
            assert r["sniffed_mime"] == "image/jpeg"
            assert r["kind_matches"] == (kind == "image")
        else:
            assert r["sniffed_mime"].startswith(
                {"image": "image/", "audio": "audio/", "video": "video/"}[kind]
            )
            assert r["kind_matches"]


def test_mime_sniff_is_pure_builtins(spark):
    from ehr_ner_spark.operators.multimodal import sniff_mime, synth_media_magic

    plan = (
        sniff_mime(synth_media_magic(spark, 48))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only classifier


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from ehr_ner_spark.streaming.jobs import (
        ATTRIB_WINDOW_SEC,
        stream_stream_attribution,
    )

    got = stream_stream_attribution(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    want = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr(
            f"INTERVAL {ATTRIB_WINDOW_SEC} SECONDS")),
    ).select("user_id", "click_id", "purchase_id")
    got_set = {
        (r["user_id"], r["click_id"], r["purchase_id"]) for r in got.collect()
    }
    want_set = {
        (r["user_id"], r["click_id"], r["purchase_id"]) for r in want.collect()
    }
    assert got_set == want_set and len(got_set) > 0
