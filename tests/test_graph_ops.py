"""Hand-computed LPA communities + triangle counting on tiny graphs
(sf parity lives in test_oracle_parity.py via kg_communities /
kg_triangles)."""

from __future__ import annotations

import pytest

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
