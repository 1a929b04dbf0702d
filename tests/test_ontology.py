"""Unit + plan tests for the session-13 batch: type-hierarchy rollup,
degree assortativity, Flesch readability, and the stack() unpivot."""

from __future__ import annotations

from ehr_ner_spark import entrypoints
from ehr_ner_spark.operators.ontology import (
    GROUP_OF,
    KIND_OF,
    hierarchy_closure,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hierarchy_closure_is_a_complete_lattice():
    rows = hierarchy_closure()
    leaves = set(GROUP_OF)
    # every leaf has exactly 4 rows: self, group, kind, root
    by_leaf = {}
    for leaf, anc, level in rows:
        by_leaf.setdefault(leaf, []).append((level, anc))
    assert set(by_leaf) == leaves
    for leaf, ancs in by_leaf.items():
        levels = sorted(ancs)
        assert [lv for lv, _ in levels] == [0, 1, 2, 3]
        assert levels[0][1] == leaf
        assert levels[1][1] == GROUP_OF[leaf]
        assert levels[2][1] == KIND_OF[GROUP_OF[leaf]]
        assert levels[3][1] == "ENTITY"


def test_type_rollup_conserves_mention_counts(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["kg_type_hierarchy_closure"](
        spark, sf_dir
    )
    rows = {(r["ancestor"], r["level"]): r for r in df.collect()}
    root = rows[("ENTITY", 3)]
    leaf_total = sum(
        r["n_mentions"] for (a, lv), r in rows.items() if lv == 0
    )
    assert root["n_mentions"] == leaf_total
    # kind level partitions the root exactly
    kind_total = sum(
        r["n_mentions"] for (a, lv), r in rows.items() if lv == 2
    )
    assert kind_total == root["n_mentions"]
    assert root["n_types"] == sum(
        r["n_types"] for (a, lv), r in rows.items() if lv == 2
    )


def test_type_rollup_broadcasts_the_closure(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["kg_type_hierarchy_closure"](
        spark, sf_dir
    )
    plan = _plan(df)
    # the closure dim joins broadcast — no shuffle keyed on the hierarchy
    assert "BroadcastHashJoin" in plan


def test_assortativity_in_valid_range(spark, sf_dir):
    row = entrypoints.QUERIES_REGISTRY["kg_assortativity"](
        spark, sf_dir
    ).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_nodes"] > 0 and row["n_edges"] > 0


def test_readability_has_no_shuffle(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["ds_readability"](spark, sf_dir)
    plan = _plan(df)
    # pure per-row projection: the only exchange allowed is the initial
    # fan_out repartition for small inputs — no aggregation shuffle
    assert "Sort" not in plan
    assert "BatchEvalPython" not in plan
    bands = {r["band"] for r in df.collect()}
    assert bands <= {"very_easy", "standard", "difficult", "very_difficult"}
    assert len(bands) >= 2  # the gate actually discriminates


def test_unpivot_reads_the_table_once(spark, sf_dir):
    df = entrypoints.QUERIES_REGISTRY["rel_unpivot"](spark, sf_dir)
    plan = _plan(df)
    # stack() generator: ONE parquet scan (the oracle's UNION ALL form
    # would show four)
    assert plan.count("Scan parquet") == 1
    assert "partial_sum" in plan or "partial_count" in plan
    assert {r["measure"] for r in df.collect()} == {
        "quantity", "extendedprice", "discount", "tax"
    }
