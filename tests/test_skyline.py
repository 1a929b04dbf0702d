"""2-D skyline: per-row parity against the quadratic dominance definition
on hand-built frames (duplicate maximal pairs, band boundaries, same-price
ties); oracle parity runs in tests/driver_compare.py; plan shape (no
nested-loop join, no data-sized global window) asserted here too.
"""

from __future__ import annotations

from pyspark.sql import Row

from ehr_ner_spark.operators.skyline import skyline_price_size


def _parts(rows):
    return [
        Row(
            p_partkey=i,
            p_name=f"p{i}",
            p_brand="b",
            p_type="t",
            p_size=size,
            p_retailprice=cents / 100.0,
        )
        for i, (cents, size) in enumerate(rows)
    ]


def _brute_skyline(rows):
    out = set()
    for i, (pc, sz) in enumerate(rows):
        dominated = any(
            dc <= pc and dsz >= sz and (dc < pc or dsz > sz)
            for j, (dc, dsz) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.add(i)
    return out


def test_skyline_matches_dominance_definition(spark):
    """Crafted frame: duplicate maximal pairs both kept, a same-price
    smaller row dropped, rows straddling the 10_000-cent band boundary,
    and the globally-cheapest row always on the frontier."""
    rows = [
        (500, 3),       # cheapest overall -> frontier
        (500, 2),       # same price, smaller size -> dominated
        (9_999, 10),    # last row of band 0 -> frontier
        (10_000, 10),   # first row of band 1, same size as cheaper row -> dominated
        (10_001, 12),   # frontier
        (10_001, 12),   # duplicate maximal pair -> BOTH kept
        (20_000, 12),   # same size as cheaper 10_001 row -> dominated
        (30_000, 50),   # frontier
        (40_000, 49),   # dominated by (30_000, 50)
    ]
    want = _brute_skyline(rows)
    got = {
        r.p_partkey
        for r in skyline_price_size(spark.createDataFrame(_parts(rows))).collect()
    }
    assert got == want
    assert {0, 2, 4, 5, 7} <= got and 1 not in got and 3 not in got


def test_skyline_plan_no_nested_loop_no_global_window(spark, sf_dir):
    plan = skyline_price_size(
        spark.read.parquet(f"{sf_dir}/part.parquet")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every window is either banded (partitioned) or over the one-row-per-
    # band totals frame; no window may run over the raw per-part rows
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert window_lines, "expected the two prefix-max windows in the plan"
    assert all("p_partkey" not in ln for ln in window_lines)


def test_skyline_fuzz_against_dominance(spark):
    """Property: the banded two-phase prefix-max frontier equals the
    quadratic dominance definition on adversarial frames — duplicate
    (price, size) pairs, many rows per price, prices clustered on band
    boundaries, tiny bands."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    prices = st.one_of(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=9_995, max_value=10_005),   # band edge
        st.integers(min_value=19_998, max_value=20_002),  # band edge
    )
    rows_st = st.lists(
        st.tuples(prices, st.integers(min_value=0, max_value=6)),
        min_size=1,
        max_size=14,
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_st)
    def run(rows):
        want = _brute_skyline(rows)
        got = {
            r.p_partkey
            for r in skyline_price_size(
                spark.createDataFrame(_parts(rows))
            ).collect()
        }
        assert got == want

    run()
