"""CSR adjacency export: pure-Python reference parity, parallelism
invariance of the two-level prefix sum, and the no-global-data-window
plan contract."""

from __future__ import annotations

import pytest

from ehr_ner_spark.operators.csr import adjacency_csr

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
    ("e", "f"), ("a", "d"), ("d", "f"),
]


def _reference(edges):
    """Single-threaded CSR truth: sorted nodes, sorted neighbors,
    exclusive degree prefix sum."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out, off = [], 0
    for node in sorted(adj):
        nbrs = sorted(adj[node])
        out.append((node, len(nbrs), off, nbrs))
        off += len(nbrs)
    return out


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["ent_a", "ent_b"])


def test_csr_matches_reference(spark, edges_df):
    got = sorted(
        (r.node, r.degree, r.csr_offset, list(r.neighbors))
        for r in adjacency_csr(edges_df).collect()
    )
    assert got == _reference(EDGES)


def test_csr_offsets_invariant_under_parallelism(spark, edges_df):
    """The offsets are a pure function of the data: 1, 3 and 16 range
    partitions must produce byte-identical rows (the bases absorb the
    boundary choice)."""
    rows = {
        n: sorted(map(tuple, adjacency_csr(edges_df, num_partitions=n)
                      .collect()))
        for n in (1, 3, 16)
    }
    assert rows[1] == rows[3] == rows[16]


def test_csr_offsets_are_contiguous(spark, edges_df):
    rows = sorted(adjacency_csr(edges_df).collect(),
                  key=lambda r: r.csr_offset)
    expect = 0
    for r in rows:
        assert r.csr_offset == expect
        assert r.degree == len(r.neighbors)
        expect += r.degree
    assert expect == 2 * len(EDGES)


def test_csr_local_window_is_partitioned(spark, edges_df):
    """Plan contract: the data-sized running-sum window is partitioned by
    the materialized partition id — the only unpartitioned window in the
    plan is the base window over the partition-count-sized totals frame
    (its input aggregates to one row per partition before the sort)."""
    plan = (
        adjacency_csr(edges_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    windows = re.findall(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)",
                         plan)
    assert windows, plan
    local = [w for w in windows if "_pid" in w.split(",")[0]]
    assert local, f"running-sum window lost its _pid partitioning: {windows}"
