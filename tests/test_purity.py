"""Cluster type-purity metric (operators/purity.py): hand-checked
majority/tie semantics and the pure-cluster invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_ner_spark.operators.purity import cluster_purity


def _canon(spark, rows):
    df = spark.createDataFrame(rows, ["obj", "type"])
    return df.select(
        "obj", F.concat(F.lit("hasEntityType:"), F.col("type")).alias("pred")
    )


def test_purity_majority_and_ties(spark):
    rows = (
        [("aspirin", "DRUG")] * 3 + [("aspirin", "DISEASE")]      # 3:1
        + [("fever", "SYMPTOM")] * 2                               # pure
        + [("odd", "A"), ("odd", "B")]                             # 1:1 tie
    )
    out = {r["entity"]: r for r in cluster_purity(_canon(spark, rows)).collect()}
    a = out["aspirin"]
    assert (a["n_mentions"], a["n_types"], a["majority_type"]) == (4, 2, "DRUG")
    assert a["purity"] == 0.75
    f = out["fever"]
    assert (f["n_types"], f["majority_type"], f["purity"]) == (1, "SYMPTOM", 1.0)
    o = out["odd"]  # tie breaks to the lexicographically smallest type
    assert (o["majority_type"], o["purity"]) == ("A", 0.5)


def test_purity_single_type_clusters_are_pure(spark):
    rows = [(f"e{i}", "DRUG") for i in range(5) for _ in range(i + 1)]
    out = cluster_purity(_canon(spark, rows)).collect()
    assert len(out) == 5
    assert all(r["purity"] == 1.0 and r["n_types"] == 1 for r in out)
