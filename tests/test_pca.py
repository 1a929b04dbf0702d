"""PCA power iteration + principal-axis projections: known-direction
recovery, a pure-Python replication of the snapped iteration, and the
zero-corpus guard (oracle parity runs in tests/driver_compare.py; plan
shape is asserted in tests/test_plans.py)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Row

from ehr_ner_spark.operators.pca import pca_outliers, pca_power

DIM = 8


def _emb(spark, X):
    return spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in row], label="l")
            for i, row in enumerate(X)
        ]
    )


def _py_power(X, dim, iters):
    """Pure-Python replication of the engine's snapped iteration."""
    K = np.floor(np.asarray(X, dtype=np.float64) * 1_000_000 + 0.5)
    G = (K.T @ K).astype(np.int64)
    v = np.ones(dim)
    mx = 0.0
    for _ in range(iters):
        w = (G.astype(np.float64) * v).sum(axis=1)
        mx = float(np.max(np.abs(w)))
        if mx == 0.0:
            v = np.zeros(dim)
        else:
            v = np.floor(w / mx * 1e9 + 0.5) / 1e9
    v_mu = np.floor(v * 1e6 + 0.5).astype(np.int64)
    lam = int(math.floor(mx / 1000.0 + 0.5))
    return K, v_mu, lam


def _spiked(n=40, spike=0):
    """Deterministic corpus with a dominant direction e_spike."""
    rng = np.random.RandomState(7)
    X = rng.uniform(-0.05, 0.05, size=(n, DIM))
    X[:, spike] += np.linspace(-0.9, 0.9, n)
    return X


def test_pca_recovers_spiked_direction(spark):
    X = _spiked()
    rows = pca_power(_emb(spark, X), dim=DIM).collect()
    assert len(rows) == DIM
    by_dim = {r["dim"]: r for r in rows}
    # max-norm scaling: the dominant coordinate is the +/-1e6 entry
    mags = {d: abs(r["v_mu"]) for d, r in by_dim.items()}
    assert max(mags, key=mags.get) == 0
    assert mags[0] == 1_000_000
    assert all(mags[d] < 300_000 for d in range(1, DIM))
    assert rows[0]["eigenvalue_kilo"] > 0


def test_pca_matches_python_replication(spark):
    X = _spiked(n=25, spike=3)
    _, v_mu, lam = _py_power(X, DIM, 4)
    rows = {r["dim"]: r for r in pca_power(_emb(spark, X), dim=DIM).collect()}
    for d in range(DIM):
        assert rows[d]["v_mu"] == v_mu[d]
        assert rows[d]["eigenvalue_kilo"] == lam


def test_pca_outliers_exact_projections_and_ranking(spark):
    X = _spiked()
    K, v_mu, _ = _py_power(X, DIM, 4)
    proj = (K.astype(np.int64) * v_mu).sum(axis=1)
    order = sorted(range(len(X)), key=lambda i: (-abs(int(proj[i])), i))[:20]
    out = pca_outliers(_emb(spark, X), dim=DIM).collect()
    assert [r["vec_id"] for r in out] == order
    for r in out:
        assert r["proj_q"] == int(proj[r["vec_id"]])
    # the linspace extremes are the most extreme along the spike
    assert set(o["vec_id"] for o in out[:2]) == {0, len(X) - 1}


def test_pca_zero_corpus_guard(spark):
    """All-zero embeddings: mx = 0 every round, the guard yields the zero
    vector and eigenvalue 0 instead of a division by zero."""
    X = np.zeros((3, DIM))
    rows = pca_power(_emb(spark, X), dim=DIM).collect()
    assert all(r["v_mu"] == 0 and r["eigenvalue_kilo"] == 0 for r in rows)
