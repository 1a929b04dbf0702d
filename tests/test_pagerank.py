"""PageRank kernel tests: the Spark power iteration must match a NumPy
reference that applies the identical 1e-9 snap schedule, conserve rank mass
(undirected walk has no dangling nodes), and be partitioning-invariant."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ehr_ner_spark.operators.pagerank import PR_DAMPING, PR_ITERS, pagerank


def _snap(x: np.ndarray, scale: int) -> np.ndarray:
    return np.floor(x * float(scale) + 0.5) / float(scale)


def _numpy_pagerank(edges, iters=PR_ITERS, damping=PR_DAMPING):
    ed = sorted(set(edges))
    bidir = ed + [(b, a) for a, b in ed]
    nodes = sorted({a for a, _ in bidir})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in bidir:
        deg[idx[a]] += 1
    pr = _snap(np.full(n, 1.0 / n), 1_000_000_000)
    base = (1.0 - damping) / n
    for _ in range(iters):
        nxt = np.zeros(n)
        for a, b in bidir:
            nxt[idx[b]] += pr[idx[a]] / deg[idx[a]]
        pr = _snap(base + damping * nxt, 1_000_000_000)
    return {nodes[i]: _snap(pr, 1_000_000)[i] for i in range(n)}


EDGES = [
    ("doc:1", "aspirin"), ("doc:1", "warfarin"), ("doc:2", "aspirin"),
    ("doc:3", "aspirin"), ("doc:3", "heparin"), ("doc:4", "heparin"),
    ("doc:5", "warfarin"), ("doc:5", "aspirin"), ("doc:5", "heparin"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [(a, "hasEntityType:DRUG", b) for a, b in EDGES],
        ["subj", "pred", "obj"],
    )


def test_pagerank_matches_numpy(spark, triples):
    got = {r["node"]: r["pr"] for r in pagerank(triples).collect()}
    want = _numpy_pagerank(EDGES)
    assert got == want


def test_pagerank_conserves_mass(spark, triples):
    total = sum(r["pr"] for r in pagerank(triples).collect())
    # undirected walk: no dangling mass leak; only snap error (<= 1e-6/node)
    assert math.isclose(total, 1.0, abs_tol=1e-5)


def test_pagerank_partitioning_invariant(spark, triples):
    a = sorted(map(tuple, pagerank(triples.repartition(1)).collect()))
    b = sorted(map(tuple, pagerank(triples.repartition(7)).collect()))
    assert a == b


def test_pagerank_duplicate_edges_collapse(spark, triples):
    # triples carry one row per mention; ranks must depend on the distinct
    # edge set only
    dup = triples.unionByName(triples)
    a = sorted(map(tuple, pagerank(dup).collect()))
    b = sorted(map(tuple, pagerank(triples).collect()))
    assert a == b
