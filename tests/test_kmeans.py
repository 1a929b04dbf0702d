"""k-means over the embeddings table: partition invariants and Lloyd
improvement (the oracle equality itself is covered by
tests/test_oracle_parity.py::test_query_matches_oracle[ds_kmeans])."""

from __future__ import annotations

import pytest

from ehr_ner_spark.operators.kmeans import K_CLUSTERS, kmeans_clusters


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_partition_invariants(spark, emb):
    n = emb.count()
    out = kmeans_clusters(emb).collect()
    assert 1 <= len(out) <= K_CLUSTERS
    assert sum(r.n_points for r in out) == n
    assert all(0 <= r.cluster < K_CLUSTERS for r in out)
    assert all(r.inertia >= 0 for r in out)


def test_lloyd_iterations_reduce_inertia(spark, emb):
    """Each Lloyd round cannot increase total inertia (assignment and
    re-estimation are both descent steps; the 1e-6 centroid snap can move
    it by at most a hair, far below the improvement at this scale)."""
    i1 = sum(r.inertia for r in kmeans_clusters(emb, iters=1).collect())
    i2 = sum(r.inertia for r in kmeans_clusters(emb, iters=2).collect())
    assert i2 <= i1 + 1e-3, (i1, i2)
