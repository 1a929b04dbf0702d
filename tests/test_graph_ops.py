"""Hand-computed LPA communities + triangle counting on tiny graphs
(sf parity lives in test_oracle_parity.py via kg_communities /
kg_triangles)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ehr_ner_spark.operators.communities import entity_edges, label_propagation
from ehr_ner_spark.operators.triangles import triangle_stats


@pytest.fixture(scope="module")
def mentions(spark):
    # triangle {a,b,c} (every pair in docs 1+2), pair {x,y} (docs 3+4);
    # doc 5's a-x pair has support 1 and must be dropped by min_pair=2
    rows = []
    for d in (1, 2):
        rows += [(d, "a"), (d, "b"), (d, "c")]
    for d in (3, 4):
        rows += [(d, "x"), (d, "y")]
    rows += [(5, "a"), (5, "x")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_entity_edges_min_pair(spark, mentions):
    got = {(r["ent_a"], r["ent_b"]) for r in entity_edges(mentions).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")}


def test_lpa_two_communities(spark, mentions):
    out = {r["entity"]: (r["community"], r["n_members"])
           for r in label_propagation(entity_edges(mentions)).collect()}
    # min-label tie-break floods each component with its smallest name
    assert out == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "x": ("x", 2), "y": ("x", 2),
    }


def test_triangle_and_clustering(spark, mentions):
    out = {r["entity"]: (r["deg"], r["n_tri"], r["clustering"])
           for r in triangle_stats(entity_edges(mentions)).collect()}
    assert out["a"] == (2, 1, 1.0)
    assert out["b"] == (2, 1, 1.0)
    assert out["c"] == (2, 1, 1.0)
    assert out["x"] == (1, 0, 0.0)
    assert out["y"] == (1, 0, 0.0)


def test_triangle_star_has_none(spark):
    # hub h with 3 leaves and no leaf-leaf edge: degree orientation points
    # every edge leaf->hub, so zero wedges form at the hub
    rows = []
    for d, leaf in ((1, "l1"), (2, "l2"), (3, "l3")):
        for rep in (0, 1):  # each hub-leaf pair in two docs
            rows += [(10 * d + rep, "h"), (10 * d + rep, leaf)]
    star = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["entity"]: (r["deg"], r["n_tri"], r["clustering"])
           for r in triangle_stats(entity_edges(star)).collect()}
    assert out["h"] == (3, 0, 0.0)
    assert all(out[leaf] == (1, 0, 0.0) for leaf in ("l1", "l2", "l3"))


def test_entity_components_vs_lpa_structure(spark, mentions):
    from ehr_ner_spark.operators.communities import entity_components

    out = {r["entity"]: (r["component"], r["n_members"])
           for r in entity_components(entity_edges(mentions)).collect()}
    # two components; each labeled by its min-md5-id member (a string from
    # within the component), sizes 3 and 2
    assert out["a"][1] == 3 and out["b"] == out["a"] and out["c"] == out["a"]
    assert out["x"][1] == 2 and out["y"] == out["x"]
    assert out["a"][0] in {"a", "b", "c"}
    assert out["x"][0] in {"x", "y"}


def test_kcore_peels_tendrils(spark, mentions):
    from ehr_ner_spark.operators.communities import k_core

    out = {r["entity"]: r["core_deg"]
           for r in k_core(entity_edges(mentions)).collect()}
    # the a-b-c triangle survives the 2-core; the x-y pair peels away
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_chain_fully_peels(spark):
    from ehr_ner_spark.operators.communities import k_core

    # path graph a-b-c-d: every round exposes new degree-1 endpoints;
    # 4 rounds fully dissolve it
    rows = []
    for d, (u, v) in enumerate([("a", "b"), ("b", "c"), ("c", "d")]):
        for rep in (0, 1):
            rows += [(10 * d + rep, u), (10 * d + rep, v)]
    chain = spark.createDataFrame(rows, ["doc_id", "text"])
    assert k_core(entity_edges(chain)).count() == 0


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), ["ent_a", "ent_b"])


def test_link_prediction_path_graph(spark):
    from ehr_ner_spark.operators.linkpred import link_prediction

    # path a-b-c: the only candidate is (a, c) through spoke b,
    # jaccard = 1 / (1 + 1 - 1) = 1.0
    out = link_prediction(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ent_a"], r["ent_b"], r["cn"]) == ("a", "c", 1)
    assert (r["deg_a"], r["deg_b"]) == (1, 1)
    assert r["jaccard"] == 1.0 and r["rnk"] == 1


def test_link_prediction_excludes_existing_edges(spark):
    from ehr_ner_spark.operators.linkpred import link_prediction

    # square a-b-c-d-a: candidates are the two diagonals only
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    out = {(r["ent_a"], r["ent_b"]): r for r in
           link_prediction(_edges(spark, sq)).collect()}
    assert set(out) == {("a", "c"), ("b", "d")}
    for r in out.values():
        assert r["cn"] == 2 and r["jaccard"] == 1.0


def test_link_prediction_spoke_cap(spark):
    from ehr_ner_spark.operators.linkpred import link_prediction

    # star h-{x,y,z}: with the default cap the leaves pair through h;
    # with spoke_cap=1 the hub (deg 3) is excluded and nothing remains
    star = [("h", "x"), ("h", "y"), ("h", "z")]
    full = {(r["ent_a"], r["ent_b"])
            for r in link_prediction(_edges(spark, star)).collect()}
    assert full == {("x", "y"), ("x", "z"), ("y", "z")}
    assert link_prediction(_edges(spark, star), spoke_cap=1).count() == 0


# ---------------------------------------------------------------------------
# landmark shortest paths
# ---------------------------------------------------------------------------

def test_landmark_paths_chain_distances(spark):
    from ehr_ner_spark.operators.paths import landmark_paths

    # chain a-b-c-d-e: degrees b=c=d=2 > a=e=1, so landmarks (2, name ASC)
    # are b and c; distances are exact BFS hops capped at 3
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = {(r["landmark"], r["entity"]): r["dist"]
           for r in landmark_paths(_edges(spark, chain),
                                   n_landmarks=2, hops=3).collect()}
    assert out[("b", "b")] == 0 and out[("c", "c")] == 0
    assert out[("b", "a")] == 1 and out[("b", "c")] == 1
    assert out[("b", "d")] == 2 and out[("b", "e")] == 3
    assert out[("c", "a")] == 2 and out[("c", "e")] == 2


# ---------------------------------------------------------------------------
# random walks / skip-grams
# ---------------------------------------------------------------------------

def test_random_walks_follow_edges(spark):
    import hashlib

    from ehr_ner_spark.operators.walks import random_walks

    g = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    adj = {}
    for u, v in g:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = random_walks(_edges(spark, g), steps=3).collect()
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    # one walk per node, full length, starting at walk_id
    assert set(walks) == set(adj)
    for wid, w in walks.items():
        assert sorted(w) == [0, 1, 2, 3]
        assert w[0] == wid
        for t in range(1, 4):
            # every hop is a real edge AND the md5-argmin neighbor
            assert w[t] in adj[w[t - 1]]
            expect = min(
                adj[w[t - 1]],
                key=lambda n: (hashlib.md5(
                    f"{wid}|{t}|{n}".encode()).hexdigest(), n),
            )
            assert w[t] == expect


def test_walk_skipgrams_window_and_counts(spark):
    from ehr_ner_spark.operators.walks import random_walks, walk_skipgrams

    # path graph: walks are forced (each interior node alternates), so the
    # pair universe is small and checkable structurally
    g = [("a", "b"), ("b", "c"), ("c", "d")]
    w = random_walks(_edges(spark, g), steps=3)
    pairs = {(r["center"], r["context"]): r["n_pairs"]
             for r in walk_skipgrams(w, window=2).collect()}
    rows = {(r["walk_id"], r["step"]): r["node"] for r in w.collect()}
    expect = {}
    for (wid, s_a), center in rows.items():
        for (wid2, s_b), context in rows.items():
            if (wid2 == wid and s_a != s_b and abs(s_a - s_b) <= 2
                    and center != context):
                expect[(center, context)] = expect.get(
                    (center, context), 0) + 1
    assert pairs == expect
    # symmetric by construction
    for (c, x), n in pairs.items():
        assert pairs[(x, c)] == n


def test_landmark_paths_hop_bound_and_unreachable(spark):
    from ehr_ner_spark.operators.paths import landmark_paths

    # two components: K3 {a,b,c} (degree-2 landmarks) + far pair {x,y};
    # x/y are unreachable from any landmark and must be absent
    g = [("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")]
    out = landmark_paths(_edges(spark, g), n_landmarks=2, hops=3).collect()
    assert {r["landmark"] for r in out} == {"a", "b"}
    assert all(r["entity"] in {"a", "b", "c"} for r in out)
    assert all(r["dist"] <= 1 for r in out)  # K3 diameter


def test_ego_networks_min_hop_and_seed_exclusion(spark):
    from pyspark.sql import Row

    from ehr_ner_spark.operators.walks import ego_networks

    # path graph A-B-C-D plus triangle A-B, B-C, A-C would give hop ties;
    # use a simple known shape and force every node to be a seed (mod=1)
    edges = spark.createDataFrame(
        [Row(ent_a="A", ent_b="B"), Row(ent_a="B", ent_b="C"),
         Row(ent_a="C", ent_b="D")]
    )
    rows = ego_networks(edges, mod=1).collect()
    nets = {}
    for r in rows:
        nets.setdefault(r.seed, {})[r.node] = r.hop
    assert nets["A"] == {"B": 1, "C": 2}
    assert nets["B"] == {"A": 1, "C": 1, "D": 2}
    assert nets["D"] == {"C": 1, "B": 2}
    # seed never appears in its own net; every node at its minimum hop
    for seed, net in nets.items():
        assert seed not in net


def test_modularity_planted_two_cliques(spark):
    """Two 5-cliques joined by one bridge edge: the true 2-way partition
    scores high positive modularity; the singleton partition scores
    negative; the one-community partition scores exactly 0."""
    import math

    from ehr_ner_spark.operators.communities import modularity

    nodes_a = [f"a{i}" for i in range(5)]
    nodes_b = [f"b{i}" for i in range(5)]
    edges = []
    for grp in (nodes_a, nodes_b):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((grp[i], grp[j]))
    edges.append(("a0", "b0"))
    edf = spark.createDataFrame(edges, "ent_a string, ent_b string")
    m = len(edges)

    def score(assign):
        lab = spark.createDataFrame(
            [(n, c) for n, c in assign.items()], "entity string, community string"
        )
        return modularity(edf, lab).collect()[0].q_micro

    true_part = {n: "A" for n in nodes_a} | {n: "B" for n in nodes_b}
    q_true = score(true_part)
    # hand value: e_A = e_B = 10, d_A = d_B = 21, m = 21
    num = 2 * (4 * m * 10 - 21 * 21)
    assert q_true == math.floor(1e6 * num / (4 * m * m)) and q_true > 0

    q_single = score({n: "ALL" for n in nodes_a + nodes_b})
    assert q_single == 0

    q_sing = score({n: n for n in nodes_a + nodes_b})
    assert q_sing < 0


def test_modularity_trajectory_rounds(spark):
    """Round 0 = singleton partition (one community per node, negative
    Q); rounds are monotone in community-count collapse."""
    from ehr_ner_spark.operators.communities import (
        entity_edges,
        modularity_trajectory,
    )
    from ehr_ner_spark.operators.mention_detect import detect_mentions
    from ehr_ner_spark.entrypoints import corpus

    m = detect_mentions(corpus(spark, "/root/testdata/sf0.001"),
                        num_partitions=4)
    rows = {r.round: r for r in
            modularity_trajectory(entity_edges(m)).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    n0 = rows[0].n_communities
    assert rows[0].q_micro < 0 and n0 > 1
    assert all(rows[r].n_communities <= rows[r - 1].n_communities
               for r in range(1, 5))


def test_k_truss_peels_spokes_keeps_clique(spark):
    """Planted graph: K4 (every edge in 2 triangles -> survives 4-truss)
    + a pendant spoke + a triangle hanging off one clique node (each
    triangle edge in only 1 triangle -> peeled)."""
    from ehr_ner_spark.operators.communities import k_truss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    extra = [("d", "e"), ("e", "f"), ("d", "f"), ("a", "z")]
    edges = spark.createDataFrame(k4 + extra, "ent_a string, ent_b string")
    out = {(r["ent_a"], r["ent_b"]): r["supp"]
           for r in k_truss(edges, checkpoint=False).collect()}
    assert set(out) == set(k4)
    assert all(s == 2 for s in out.values())


def test_k_truss_is_subset_of_edges_and_supports_consistent(spark, sf_dir):
    from ehr_ner_spark.operators.communities import (
        KTRUSS_K,
        entity_edges,
        k_truss,
    )
    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.operators.mention_detect import detect_mentions

    m = detect_mentions(corpus(spark, sf_dir), num_partitions=4)
    ed = entity_edges(m).persist()
    out = k_truss(ed).persist()
    assert out.count() > 0
    assert out.where(F.col("supp") < KTRUSS_K - 2).count() == 0
    # truss edges are a subset of the input edges
    assert out.join(ed, ["ent_a", "ent_b"], "left_anti").count() == 0


def test_stress_centrality_matches_bruteforce_bfs(spark):
    """Planted graph vs a pure-Python BFS-with-sigma reference replaying
    the same hash-uniform source pick and hop cap."""
    from collections import deque

    from ehr_ner_spark.hashing import md5_60
    from ehr_ner_spark.operators.paths import (
        PATHS_HOPS,
        PATHS_LANDMARKS,
        stress_centrality,
    )

    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
           ("f", "g"), ("g", "h"), ("a", "h"), ("b", "f"), ("c", "g")]
    edges = spark.createDataFrame(raw, "ent_a string, ent_b string")
    out = {r["entity"]: (r["stress"], r["n_geodesic_pairs"])
           for r in stress_centrality(edges, checkpoint=False).collect()}

    adj = {}
    for x, y in raw:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    nodes = sorted(adj)
    lms = sorted(nodes, key=lambda n: (md5_60(n), n))[:PATHS_LANDMARKS]

    def bfs_sigma(src):
        dist, sigma = {src: 0}, {src: 1}
        frontier = [src]
        for r in range(1, PATHS_HOPS + 1):
            nxt = {}
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, s in nxt.items():
                dist[v], sigma[v] = r, s
            frontier = list(nxt)
        return dist, sigma

    reach = {l: bfs_sigma(l) for l in lms}
    want = {}
    for i, s in enumerate(lms):
        for t in lms[i + 1:]:
            a, b = (s, t) if s < t else (t, s)
            d_ab = reach[a][0].get(b)
            if d_ab is None:
                continue
            for v in nodes:
                d1 = reach[a][0].get(v)
                d2 = reach[b][0].get(v)
                if d1 and d2 and d1 + d2 == d_ab:
                    st, np_ = want.get(v, (0, 0))
                    want[v] = (st + reach[a][1][v] * reach[b][1][v], np_ + 1)
    assert out == want and want, (out, want, lms)


def test_linkpred_auc_matches_pure_python(spark):
    from itertools import combinations

    from ehr_ner_spark.hashing import md5_60
    from ehr_ner_spark.operators.linkpred import (
        AUC_HOLDOUT_MOD,
        AUC_NEG_BUCKETS,
        linkpred_auc,
    )

    # two cliques bridged by one edge; hash-bucket-0 nodes (n03, n04,
    # n80) live in clique A and bucket-1 nodes (n20, n22, n24) in clique
    # B, so cross-clique bucket pairs are NON-edges -> the negative
    # sample is non-empty
    clique_a = ["n03", "n04", "n80", "n05", "n06", "n07"]
    clique_b = ["n20", "n22", "n24", "n08", "n09", "n10"]
    raw = sorted(
        {tuple(sorted(p)) for p in combinations(clique_a, 2)}
        | {tuple(sorted(p)) for p in combinations(clique_b, 2)}
        | {tuple(sorted(("n07", "n08")))}
    )
    edges = spark.createDataFrame(raw, "ent_a string, ent_b string")
    got = linkpred_auc(edges).collect()[0]

    hold = {(a, b) for a, b in raw
            if md5_60(f"{a}|{b}") % AUC_HOLDOUT_MOD == 0}
    train = [e for e in raw if e not in hold]
    adj = {}
    for a, b in train:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tnodes = sorted(adj)
    b0 = [n for n in tnodes if md5_60(n) % AUC_NEG_BUCKETS == 0]
    b1 = [n for n in tnodes if md5_60(n) % AUC_NEG_BUCKETS == 1]
    neg = {(min(x, y), max(x, y)) for x in b0 for y in b1
           if (min(x, y), max(x, y)) not in set(raw) and x != y}

    def cn(p):
        return len(adj.get(p[0], set()) & adj.get(p[1], set()))

    ps = [cn(p) for p in sorted(hold)]
    ns = [cn(p) for p in sorted(neg)]
    assert ps and ns, "planted graph produced empty pos/neg sets"
    u2 = sum(2 if sp > sn else (1 if sp == sn else 0)
             for sp in ps for sn in ns)
    assert got["n_pos"] == len(ps) and got["n_neg"] == len(ns)
    assert got["u2"] == u2
    assert got["auc_micro"] == (1_000_000 * u2) // (2 * len(ps) * len(ns))


def test_linkpred_auc_negative_pairs_bounded_by_side_cap(spark, monkeypatch):
    """The negative crossJoin is O(K^2) INDEPENDENT of graph size: each
    side is the K hash-smallest nodes of its bucket (orderBy+limit heap),
    so a graph with many bucket-0/bucket-1 nodes still emits <= K^2
    negative candidates.  K is patched down to 3 so the planted star
    graph (hundreds of nodes, dozens per bucket) overflows both sides."""
    from ehr_ner_spark.hashing import md5_60
    from ehr_ner_spark.operators import linkpred as lp

    monkeypatch.setattr(lp, "AUC_NEG_SIDE_K", 3)

    # star graph: every node rides one edge to the hub -> every train
    # node appears in bidir; names chosen blind, bucketed by md5 below
    names = [f"node{i:04d}" for i in range(400)]
    raw = sorted((min("hub", n), max("hub", n)) for n in names)
    edges = spark.createDataFrame(raw, "ent_a string, ent_b string")
    got = lp.linkpred_auc(edges).collect()[0]

    hold = {(a, b) for a, b in raw
            if md5_60(f"{a}|{b}") % lp.AUC_HOLDOUT_MOD == 0}
    train = [e for e in raw if e not in hold]
    adj = {}
    for a, b in train:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tnodes = sorted(adj)
    b0_all = [n for n in tnodes if md5_60(n) % lp.AUC_NEG_BUCKETS == 0]
    b1_all = [n for n in tnodes if md5_60(n) % lp.AUC_NEG_BUCKETS == 1]
    assert len(b0_all) > 3 and len(b1_all) > 3, "graph must overflow the cap"
    side0 = sorted(b0_all, key=lambda n: (md5_60(n), n))[:3]
    side1 = sorted(b1_all, key=lambda n: (md5_60(n), n))[:3]
    neg = {(min(x, y), max(x, y)) for x in side0 for y in side1
           if (min(x, y), max(x, y)) not in set(raw) and x != y}

    def cn(p):
        return len(adj.get(p[0], set()) & adj.get(p[1], set()))

    ps = [cn(p) for p in sorted(hold)]
    ns = [cn(p) for p in sorted(neg)]
    assert ns and len(ns) <= 9, "capped negatives must be <= K^2"
    u2 = sum(2 if sp > sn else (1 if sp == sn else 0)
             for sp in ps for sn in ns)
    assert got["n_pos"] == len(ps) and got["n_neg"] == len(ns)
    assert got["u2"] == u2
