"""Ordered-funnel semantics on a crafted event log (sf parity lives in
the rel_funnel oracle): out-of-order steps must NOT count."""

from __future__ import annotations

import datetime as dt

from ehr_ner_spark.entrypoints import QUERIES_REGISTRY


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_enforces_order(spark, tmp_path, monkeypatch):
    rows = [
        # u1: full ordered funnel
        (1, _ts(1), 1, "view", 0.0, "{}"),
        (2, _ts(2), 1, "click", 0.0, "{}"),
        (3, _ts(3), 1, "purchase", 0.0, "{}"),
        # u2: click BEFORE view -> no click credit; purchase after the
        # (uncredited) click -> no purchase credit either
        (4, _ts(1), 2, "click", 0.0, "{}"),
        (5, _ts(2), 2, "view", 0.0, "{}"),
        (6, _ts(3), 2, "purchase", 0.0, "{}"),
        # u3: view+click same minute -> strict < denies the click
        (7, _ts(1), 3, "view", 0.0, "{}"),
        (8, _ts(1), 3, "click", 0.0, "{}"),
        # u4: view -> click, purchase missing
        (9, _ts(1), 4, "view", 0.0, "{}"),
        (10, _ts(2), 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    # the registry reads <sf_dir>/events.parquet
    import ehr_ner_spark.entrypoints as ep

    monkeypatch.setattr(
        ep, "_t",
        lambda spark_, sf_dir, name: spark_.read.parquet(p),
    )
    out = QUERIES_REGISTRY["rel_funnel"](spark, str(tmp_path)).collect()[0]
    assert (out["n_view"], out["n_click"], out["n_purchase"]) == (4, 2, 1)
