"""Session-23 batch: closed-form distributed multiple regression."""

from __future__ import annotations

import numpy as np
import pytest


def test_multiple_regression_matches_numpy_lstsq(spark, sf_dir):
    from ehr_ner_spark.operators.regression import multiple_regression

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = {r["l_returnflag"]: r for r in multiple_regression(li).collect()}
    pdf = li.select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    for flag, g in pdf.groupby("l_returnflag"):
        x1 = g["l_quantity"].to_numpy().astype(np.int64)
        # half-AWAY rounding (engine/SQL ROUND), not numpy's half-to-even
        x2 = np.floor(g["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
        y = np.floor(g["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        X = np.column_stack([np.ones(len(g)), x1, x2])
        beta, _, _, _ = np.linalg.lstsq(X, y.astype(float), rcond=None)
        pred = X @ beta
        sst = ((y - y.mean()) ** 2).sum()
        r2 = 1.0 - ((y - pred) ** 2).sum() / sst
        r = out[flag]
        assert r["n"] == len(g)
        assert r["b0"] == pytest.approx(beta[0], rel=1e-9, abs=1e-6)
        assert r["b1"] == pytest.approx(beta[1], rel=1e-9, abs=1e-6)
        assert r["b2"] == pytest.approx(beta[2], rel=1e-9, abs=1e-6)
        assert r["r2"] == pytest.approx(r2, rel=1e-6, abs=1e-6)


def test_multiple_regression_single_exchange_mapside(spark, sf_dir):
    """Plan gate: one shuffle total, partial aggregation before it, no
    Python stage — the 100-TB shape (ten combinable BIGINT moments)."""
    from ehr_ner_spark.operators.regression import multiple_regression

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = multiple_regression(li)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
