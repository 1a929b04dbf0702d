"""FD audit (operators/dataquality.py): hand-checked g3 arithmetic and
violation counts on a constructed table, plus the FDS wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_ner_spark.operators.dataquality import _audit_one, fd_violations


def test_audit_hand_case(spark):
    # key 1: y in {a, a, b}  -> 1 violating row (delete one 'b')
    # key 2: y = {c}         -> clean
    # key 3: y in {d, e}     -> 1 violating row
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e")],
        "k long, v string",
    )
    r = _audit_one(df, "t.k->v", "k", "v").collect()[0]
    assert r["fd"] == "t.k->v"
    assert r["n_keys"] == 3
    assert r["n_violating_keys"] == 2
    assert r["n_rows"] == 6
    assert r["n_violating_rows"] == 2
    assert r["g3_error"] == 0.333333            # floor(2/6*1e6+0.5)/1e6


def test_fd_violations_unique_key_is_clean(spark, sf_dir):
    rows = {r["fd"]: r for r in fd_violations({
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "events": spark.read.parquet(f"{sf_dir}/events.parquet"),
    }).collect()}
    assert len(rows) == 3
    # c_custkey is unique, so the FD holds exactly
    clean = rows["customer.c_custkey->c_mktsegment"]
    assert clean["n_violating_keys"] == 0 and clean["g3_error"] == 0.0
    # user behaviour is not functional in event_type
    dirty = rows["events.user_id->event_type"]
    assert dirty["n_violating_rows"] > 0 and dirty["g3_error"] > 0.0
