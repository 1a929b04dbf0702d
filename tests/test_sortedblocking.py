"""Session-23 batch: multi-pass sorted-neighborhood blocking."""

from __future__ import annotations

import math


def _trigrams(s: str) -> set:
    return {s[i:i + 3] for i in range(len(s) - 2)}


def _jac(a: str, b: str) -> float:
    ga, gb = _trigrams(a), _trigrams(b)
    x = len(ga & gb) / len(ga | gb)
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_snm_sound_and_window_complete(spark, sf_dir):
    """Soundness: every emitted pair really clears the exact trigram
    threshold.  SNM guarantee: every pair within w in EITHER sorted pass
    (same 1-char prefix block) that clears the threshold is emitted."""
    from ehr_ner_spark.operators.sortedblocking import (
        SNM_TAU,
        SNM_WINDOW,
        snm_pairs,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = {(r["name_a"], r["name_b"]): r["sim"]
           for r in snm_pairs(part).collect()}
    names = sorted({r["p_name"] for r in part.select("p_name").collect()})

    # soundness + exactness of sim
    for (a, b), sim in out.items():
        assert sim >= SNM_TAU
        assert abs(sim - _jac(a, b)) < 1e-9

    # completeness within the blocked neighborhoods of both passes
    must_find = set()
    for key in (lambda s: s, lambda s: s[::-1]):
        ranked = sorted(names, key=key)
        for i, a in enumerate(ranked):
            for b in ranked[i + 1:i + 1 + SNM_WINDOW]:
                if key(a)[0] != key(b)[0]:
                    continue  # prefix-block boundary: documented SNM loss
                if _jac(a, b) >= SNM_TAU:
                    must_find.add((min(a, b), max(a, b)))
    assert must_find <= set(out)

    # linear candidate bound: <= 2 passes * w per surface
    assert len(out) <= 2 * SNM_WINDOW * len(names)


def test_snm_windows_are_partitioned_not_global(spark, sf_dir):
    """Plan gate: the SNM windows run per (pass, prefix) block — no
    SinglePartition exchange anywhere (a global Window would serialize
    the sort on one task at 100 TB)."""
    from ehr_ner_spark.operators.sortedblocking import snm_pairs

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = snm_pairs(part)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_grams_short_and_long_surfaces(spark):
    """<3-char surfaces emit NO grams (unguarded sequence(1, len-2)
    counts down and fabricates sub-trigrams); >66-char surfaces keep
    every position (the twin derives its bound per row, no literal cap)."""
    from ehr_ner_spark.operators.sortedblocking import _grams

    long_name = "x" * 30 + "abcdefghijklmnopqrstuvwxyz" + "y" * 30  # 86 chars
    df = spark.createDataFrame(
        [("a",), ("ab",), ("abc",), (long_name,)], ["name"]
    )
    got = {
        n: sorted(r["gram"] for r in rows)
        for n, rows in __import__("itertools").groupby(
            sorted(_grams(df, "name", "name").collect(),
                   key=lambda r: r["name"]),
            key=lambda r: r["name"],
        )
    }
    def ref(s):
        return sorted({s[i:i + 3] for i in range(len(s) - 2)})
    assert "a" not in got and "ab" not in got
    assert got["abc"] == ["abc"]
    assert got[long_name] == ref(long_name)
