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


def _ref_walks(edges, steps=3):
    import hashlib

    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    out = {}
    for wid in nbrs:
        node, walk = wid, {0: wid}
        for t in range(1, steps + 1):
            node = min(nbrs[node], key=lambda n: (
                hashlib.md5(f"{wid}|{t}|{n}".encode()).hexdigest(), n))
            walk[t] = node
        out[wid] = walk
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_random_walks_match_reference(spark, edges):
    from ehr_ner_spark.operators.walks import random_walks

    rows = random_walks(_edges_df(spark, edges), steps=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert got == _ref_walks(edges, steps=3)


def _ref_linkpred(edges, spoke_cap=64):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    cn = Counter()
    for spoke, ns in nbrs.items():
        if len(ns) > spoke_cap:
            continue
        ns = sorted(ns)
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                cn[(u, w)] += 1
    return {p: c for p, c in cn.items() if p not in set(edges)}


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_link_prediction_matches_reference(spark, edges):
    from ehr_ner_spark.operators.linkpred import link_prediction

    rows = link_prediction(_edges_df(spark, edges), k=1000).collect()
    got = {(r["ent_a"], r["ent_b"]): r["cn"] for r in rows}
    assert got == _ref_linkpred(edges)
    for r in rows:  # jaccard consistency against degrees
        union = r["deg_a"] + r["deg_b"] - r["cn"]
        assert abs(r["jaccard"] - r["cn"] / union) < 1e-6


def _ref_landmarks(edges, n_landmarks=2, hops=3):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    lms = sorted(deg, key=lambda n: (-deg[n], n))[:n_landmarks]
    out = {}
    for lm in lms:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, hops + 1):
            nxt = [m for f in frontier for m in nbrs[f] if m not in dist]
            for m in nxt:
                dist.setdefault(m, d)
            frontier = list(dict.fromkeys(nxt))
        for n, d in dist.items():
            out[(lm, n)] = d
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_landmark_paths_match_reference(spark, edges):
    from ehr_ner_spark.operators.paths import landmark_paths

    rows = landmark_paths(_edges_df(spark, edges),
                          n_landmarks=2, hops=3).collect()
    got = {(r["landmark"], r["entity"]): r["dist"] for r in rows}
    assert got == _ref_landmarks(edges)
