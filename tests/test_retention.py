"""Cohort retention (operators/retention.py): hand-checked week-index
cohorting, offsets, and ratio snapping."""

from __future__ import annotations

import datetime as dt

from ehr_ner_spark.operators.retention import cohort_retention


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, d, h)) for i, (u, d, h) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )


def test_retention_hand_case(spark):
    # 2024-01-01 is a Monday; epoch-week boundaries fall on Thursdays
    # (day 0 = Thu 1970-01-01), so Jan 1-3 and Jan 4-10 are different
    # epoch weeks. u1,u2 start in week A; u2 returns next week; u3
    # starts in week B.
    rows = [
        (1, 1, 0), (1, 2, 5),          # u1 active week A only
        (2, 3, 0), (2, 4, 0),          # u2 weeks A and B (Jan 4 = new wk)
        (3, 5, 0),                     # u3 cohort B
    ]
    out = {(r["cohort_week"], r["week_offset"]): r
           for r in cohort_retention(_ev(spark, rows)).collect()}
    wk = lambda day: (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days // 7
    A, B = wk(1), wk(4)
    assert B == A + 1
    a0 = out[(A, 0)]
    assert (a0["n_active"], a0["cohort_size"], a0["retention"]) == (2, 2, 1.0)
    a1 = out[(A, 1)]
    assert (a1["n_active"], a1["retention"]) == (1, 0.5)
    b0 = out[(B, 0)]
    assert (b0["n_active"], b0["cohort_size"], b0["retention"]) == (1, 1, 1.0)
    assert set(out) == {(A, 0), (A, 1), (B, 0)}


def test_retention_offset_zero_is_always_full(spark):
    rows = [(u, d, 0) for u in range(1, 6) for d in (u, min(u + 7, 28))]
    out = cohort_retention(_ev(spark, rows)).collect()
    for r in out:
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention"] == 1.0
