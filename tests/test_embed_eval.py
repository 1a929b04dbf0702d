"""Random projection and kNN-accuracy vs pure-Python references."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from ehr_ner_spark.operators.similarity import (
    KNN_K,
    KNN_QUERY_IDS,
    RP_OUT_DIM,
    _rp_sign,
    knn_accuracy,
    random_projection,
)


def _load(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


def test_random_projection_bit_exact_python_fold(spark, sf_dir):
    rows = _load(sf_dir)
    got = {
        r.vec_id: (r.label, list(r.proj))
        for r in random_projection(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ).collect()
    }
    assert len(got) == len(rows)
    for vec_id, emb, label in rows[:25]:
        want = []
        for j in range(RP_OUT_DIM):
            acc = None
            for i, x in enumerate(emb):
                x = float(x)  # float32 -> double, exact
                if acc is None:
                    acc = x if _rp_sign(j, i) > 0 else -x
                else:
                    acc = acc + x if _rp_sign(j, i) > 0 else acc - x
            want.append(acc)
        glabel, gproj = got[vec_id]
        assert glabel == label
        assert gproj == want  # bit-exact: same IEEE ops in the same order


def test_rp_sign_matrix_is_balanced_and_deterministic():
    signs = [_rp_sign(j, i) for j in range(RP_OUT_DIM) for i in range(64)]
    assert set(signs) == {-1, 1}
    # parity of md5 is ~balanced; guard against a degenerate all-one matrix
    assert 0.3 < (signs.count(1) / len(signs)) < 0.7
    assert signs == [_rp_sign(j, i) for j in range(RP_OUT_DIM) for i in range(64)]


def test_knn_accuracy_matches_bruteforce(spark, sf_dir):
    rows = _load(sf_dir)
    embs = {v: np.asarray(e, dtype=np.float64) for v, e, _ in rows}
    labels = {v: l for v, _, l in rows}

    per_label = defaultdict(lambda: [0, 0])
    for q in KNN_QUERY_IDS:
        qe = embs[q]
        qn = math.sqrt(float(qe @ qe))
        scored = sorted(
            (
                (-float(embs[v] @ qe) / (math.sqrt(float(embs[v] @ embs[v])) * qn), v)
                for v in embs if v != q
            )
        )[:KNN_K]
        votes = Counter(labels[v] for _, v in scored)
        pred = min((-n, lbl) for lbl, n in votes.items())[1]
        per_label[labels[q]][0] += 1
        per_label[labels[q]][1] += int(pred == labels[q])

    got = {
        r.label: (r.n, r.n_correct, r.acc)
        for r in knn_accuracy(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ).collect()
    }
    want = {
        lbl: (n, c, math.floor(c / n * 1e6 + 0.5) / 1e6)
        for lbl, (n, c) in per_label.items()
    }
    assert got == want
