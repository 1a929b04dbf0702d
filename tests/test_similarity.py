"""Similarity search: brute-force exactness vs a NumPy oracle and the
LSH-ANN recall gate vs the brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.operators.similarity import brute_force_topk, lsh_ann_topk

QUERY_IDS = list(range(8))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, qids, k):
    out = {}
    norms = np.linalg.norm(mat, axis=1)
    for q in qids:
        qi = np.where(ids == q)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(
            ((float(-cos[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q)
        )
        out[q] = [vid for _, vid in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    expected = _numpy_topk(ids, mat, QUERY_IDS, 5)
    got = {}
    for r in brute_force_topk(emb, QUERY_IDS, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for q in QUERY_IDS:
        got_ids = [v for _, v in sorted(got[q])]
        assert got_ids == expected[q], q


def test_lsh_ann_recall(spark, emb, emb_np):
    """ANN recall@5 vs brute force on the synthetic embeddings.  These are
    isotropic random vectors (no cluster structure — LSH's worst case), so
    the gate is 0.5; clustered real embeddings recall far higher at the
    same table budget."""
    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, QUERY_IDS, 5)
    got = {}
    for r in lsh_ann_topk(emb, QUERY_IDS, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & set(exact[q])) for q in QUERY_IDS)
    recall = hits / (5 * len(QUERY_IDS))
    assert recall >= 0.5, recall
    # and pruning is real: candidate sets are much smaller than the corpus
    n = emb.count()
    assert all(len(v) < 0.8 * n for v in got.values())


def test_lsh_ann_deterministic(spark, emb):
    a = sorted(map(tuple, lsh_ann_topk(emb, QUERY_IDS, k=5).collect()))
    b = sorted(map(tuple, lsh_ann_topk(emb.repartition(7), QUERY_IDS, k=5).collect()))
    assert a == b


def test_embedding_neardup_matches_numpy(spark, emb, emb_np):
    from ehr_ner_spark.operators.similarity import embedding_neardup

    ids, mat = emb_np
    m = mat.astype(np.float64)
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = unit @ unit.T
    threshold = 0.3
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((int(ids[i]), int(ids[j])))
            if cos[i, j] >= threshold - 1e-9:
                expected[(a, b)] = round(cos[i, j], 3)
    got = {
        (r.src, r.dst): r.score
        for r in embedding_neardup(emb, threshold=threshold).collect()
    }
    # boundary rows (|cos - t| < 1e-9) may differ by accumulation order;
    # everything else must match to 3 decimals
    for k in set(expected) | set(got):
        if k in expected and k in got:
            assert abs(expected[k] - got[k]) <= 0.001, k
        else:
            v = expected.get(k, got.get(k))
            assert abs(v - threshold) < 1e-6, (k, v)


def test_embedding_neardup_empty_input(spark):
    """Empty embeddings table -> empty pairs (regression: driver-side
    AxisError on the 1-D empty matrix)."""
    from ehr_ner_spark.operators.similarity import embedding_neardup

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_neardup(empty).count() == 0


def test_ivf_ann_recall_and_plan(spark, emb, emb_np):
    """IVF ANN: recall@5 vs brute force above a floor on isotropic
    embeddings (nprobe=4 of ~n/25 cells), centroid set broadcast (no
    shuffle of the big side before the cell join), deterministic."""
    from ehr_ner_spark.operators.similarity import ivf_ann_topk

    ids, mat = emb_np
    truth = _numpy_topk(ids, mat, QUERY_IDS, 5)
    got: dict = {}
    res = ivf_ann_topk(emb, QUERY_IDS, k=5)
    for r in res.collect():
        got.setdefault(r.query_id, []).append(r.vec_id)
    hits = sum(len(set(got.get(q, [])) & set(truth[q])) for q in QUERY_IDS)
    recall = hits / (5 * len(QUERY_IDS))
    assert recall >= 0.3, recall  # isotropic worst case; clustered data ~1.0
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # determinism
    a = sorted(map(tuple, res.collect()))
    b = sorted(map(tuple, ivf_ann_topk(emb, QUERY_IDS, k=5).collect()))
    assert a == b


def test_semantic_dedup_clusters_and_representatives(spark):
    """Identical vectors land in one cluster with the min id as the kept
    representative; an orthogonal vector stays a singleton."""
    from ehr_ner_spark.operators.similarity import semantic_dedup

    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact duplicate of 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> own cluster
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.9).collect()}
    assert out[0].cluster_id == 0 and out[0].keep
    assert out[1].cluster_id == 0 and not out[1].keep
    assert out[1].n_members == 2
    assert out[2].cluster_id == 2 and out[2].keep and out[2].n_members == 1
