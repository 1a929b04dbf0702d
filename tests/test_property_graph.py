"""Property fuzz for the graph family: Spark LPA / k-core / triangles vs
tiny pure-Python references on random edge sets (the same depth of
verification the trainer and oracles get in test_property_train.py /
test_property_oracle.py)."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ehr_ner_spark.operators.communities import k_core, label_propagation
from ehr_ner_spark.operators.triangles import triangle_stats

NODES = [f"n{i:02d}" for i in range(10)]

edge_sets = st.sets(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)).map(
        lambda p: (min(p), max(p))
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=18,
)


def _ref_lpa(edges, iters=4):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n in nbrs:
            votes = Counter([lab[n]] + [lab[m] for m in nbrs[n]])
            new[n] = min(votes, key=lambda c: (-votes[c], c))
        lab = new
    return lab


def _ref_kcore(edges, k=2, rounds=4):
    es = set(edges)
    for _ in range(rounds):
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = Counter()
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    return {n: d for n, d in deg.items() if d >= k}


def _ref_triangles(edges):
    es = set(edges)
    nbrs = defaultdict(set)
    for a, b in es:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri = Counter()
    seen = set()
    for a, b in es:
        for c in nbrs[a] & nbrs[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for n in t:
                    tri[n] += 1
    return {n: (len(nbrs[n]), tri[n]) for n in nbrs}


def _edges_df(spark, edges):
    return spark.createDataFrame(sorted(edges), ["ent_a", "ent_b"])


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_lpa_matches_reference(spark, edges):
    got = {r["entity"]: r["community"]
           for r in label_propagation(_edges_df(spark, edges), iters=2).collect()}
    assert got == _ref_lpa(edges, iters=2)


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_kcore_matches_reference(spark, edges):
    got = {r["entity"]: r["core_deg"]
           for r in k_core(_edges_df(spark, edges), rounds=2).collect()}
    assert got == _ref_kcore(edges, rounds=2)


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_triangles_match_reference(spark, edges):
    ref = _ref_triangles(edges)
    got = {r["entity"]: (r["deg"], r["n_tri"], r["clustering"])
           for r in triangle_stats(_edges_df(spark, edges)).collect()}
    assert set(got) == set(ref)
    for n, (deg, ntri) in ref.items():
        gdeg, gtri, gclust = got[n]
        assert (gdeg, gtri) == (deg, ntri)
        want = 0.0
        if deg >= 2:
            import math

            want = math.floor(2.0 * ntri / (deg * (deg - 1)) * 1e6 + 0.5) / 1e6
        assert gclust == want
