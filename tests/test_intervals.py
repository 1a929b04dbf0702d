"""Interval operators: banded overlap join + entity validity intervals.

Correctness is pinned per-row against tiny hand-built frames (closed-
interval semantics, first-shared-band dedup, island coalescing), the
driver-style oracle parity runs in tests/driver_compare.py, and the plan
shape (hash join, never nested loop) is asserted in test_plans.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from ehr_ner_spark.operators.intervals import entity_intervals, interval_join

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user, etype="view", value=0.0):
    return Row(
        event_id=eid,
        ts=_T0 + dt.timedelta(minutes=minutes),
        user_id=user,
        event_type=etype,
        value=value,
        props="{}",
    )


def test_interval_join_closed_interval_and_pair_dedup(spark):
    """One 2-event session [0, 20min] for user 1 (gap 20min < the 30min
    session gap); two qualifying incidents: one overlapping (opens at
    10min) and one TOUCHING (opens exactly at the session end — closed
    intervals, so it matches with overlap 0).  A third error is below the
    value gate and must be ignored."""
    events = spark.createDataFrame(
        [
            _ev(0, 0, 1),
            _ev(1, 20, 1),
            # overlapping incident: [10min, 10min + 1h]
            _ev(2, 10, 2, "error", 19.0),
            # touching incident: opens exactly at session end -> overlap 0
            _ev(3, 20, 3, "error", 19.5),
            # below the value gate -> not an incident
            _ev(4, 10, 4, "error", 1.0),
        ]
    )
    out = {
        (r.user_id, r.s_start_us): r
        for r in interval_join(events).collect()
    }
    sess = out[(1, int(_T0.timestamp()) * 1_000_000)]
    # both qualifying incidents overlap user 1's session exactly once
    assert sess.n_incidents == 2
    # overlap mass: [10min, 20min] = 10min, plus the touching 0
    assert sess.overlap_us == 10 * 60 * 1_000_000


def test_interval_join_session_spanning_many_bands_counted_once(spark):
    """A session spanning the 4h band boundary (events every 29min from 0
    to 290min) overlapped by one incident window that ALSO straddles the
    boundary ([235min, 295min]): both intervals explode to bands {0, 1},
    so without the first-shared-band condition the pair would be counted
    twice.  It must appear exactly once."""
    events = spark.createDataFrame(
        [_ev(i, 29 * i, 1) for i in range(11)]
        + [_ev(99, 235, 2, "error", 20.0)]
    )
    rows = [r for r in interval_join(events).collect() if r.user_id == 1]
    assert len(rows) == 1
    assert rows[0].n_incidents == 1
    # incident [235min, 295min] clipped to session end 290min -> 55 min
    assert rows[0].overlap_us == 55 * 60 * 1_000_000


def test_entity_intervals_islands(spark):
    """Surface 'a' attested in buckets {0,1,2, 5,6} of 8 -> two runs;
    the 2-bucket run is dropped by the min-mention gate (8) while the
    3-bucket run (24 mentions) survives."""
    rows = []
    # max doc_id will be 79 -> bucket = doc_id // 10 with n_buckets=8
    for b in (0, 1, 2):
        for _ in range(8):
            rows.append(Row(doc_id=b * 10 + 1, text="a"))
    for b in (5, 6):
        for _ in range(3):
            rows.append(Row(doc_id=b * 10 + 1, text="a"))
    rows.append(Row(doc_id=79, text="z"))  # pins max_id -> 8 even buckets
    mentions = spark.createDataFrame(rows)
    out = entity_intervals(mentions, n_buckets=8, min_run_mentions=8)
    got = {(r.text, r.start_b, r.end_b): r for r in out.collect()}
    assert (("a", 0, 2) in got) and got[("a", 0, 2)].n_mentions == 24
    assert got[("a", 0, 2)].n_buckets_run == 3
    # the sparse run (6 mentions) and the singleton 'z' are gated out
    assert len(got) == 1
