"""OHLC bars / Markov transitions / z-score anomalies
(operators/timeseries.py): hand-checked picks, transition counts, and
moment arithmetic on tiny frames."""

from __future__ import annotations

import datetime as dt
import math

from ehr_ner_spark.operators.timeseries import (
    anomaly_zscore,
    markov_transitions,
    ohlc_bars,
)


def _ev(spark, rows):
    """rows: (event_id, user_id, minute, event_type, value)."""
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 10, m), t, v)
         for i, u, m, t, v in rows],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_ohlc_hand_case(spark):
    rows = [
        (1, 1, 5, "click", 10.0),
        (2, 1, 1, "click", 3.5),     # earliest -> open
        (3, 1, 59, "click", 7.25),   # latest -> close
        (4, 1, 30, "click", 99.0),   # high
        (5, 1, 2, "view", 1.0),
    ]
    out = {r["event_type"]: r for r in ohlc_bars(_ev(spark, rows)).collect()}
    c = out["click"]
    assert (c["open"], c["high"], c["low"], c["close"]) == (3.5, 99.0, 3.5, 7.25)
    assert c["n_events"] == 4
    assert math.isclose(c["volume"], 119.75)
    hour = int(dt.datetime(2024, 1, 1, 10).timestamp()) // 3600
    assert c["hour"] == hour


def test_ohlc_tie_breaks_on_event_id(spark):
    # two events at the identical timestamp: event_id orders the pick
    rows = [(7, 1, 0, "click", 5.0), (2, 1, 0, "click", 9.0)]
    c = ohlc_bars(_ev(spark, rows)).collect()[0]
    assert c["open"] == 9.0 and c["close"] == 5.0


def test_markov_hand_case(spark):
    # u1: a -> b -> a ; u2: b -> b.  No cross-user transition.
    rows = [
        (1, 1, 0, "a", 0.0), (2, 1, 1, "b", 0.0), (3, 1, 2, "a", 0.0),
        (4, 2, 0, "b", 0.0), (5, 2, 1, "b", 0.0),
    ]
    out = {(r["from_type"], r["to_type"]): r
           for r in markov_transitions(_ev(spark, rows)).collect()}
    assert out[("a", "b")]["n_trans"] == 1
    assert out[("b", "a")]["n_trans"] == 1
    assert out[("b", "b")]["n_trans"] == 1
    assert out[("a", "b")]["n_from"] == 1 and out[("a", "b")]["p"] == 1.0
    assert out[("b", "a")]["n_from"] == 2 and out[("b", "a")]["p"] == 0.5
    assert set(out) == {("a", "b"), ("b", "a"), ("b", "b")}


def test_anomaly_zscore_hand_case(spark):
    # type 'a': daily counts 1, 1, 4 over three days -> mean 2,
    # var = (1+1+16)/3 - 4 = 2, sd = sqrt(2); z(4) = 2/sqrt(2) = sqrt(2)
    rows, eid = [], 0
    for day, n in ((1, 1), (2, 1), (3, 4)):
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, dt.datetime(2024, 1, day), "a", 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double",
    )
    out = {r["day"]: r for r in anomaly_zscore(df).collect()}
    day3 = (dt.date(2024, 1, 3) - dt.date(1970, 1, 1)).days
    z = out[day3]["z"]
    assert math.isclose(z, math.floor(math.sqrt(2) * 1e6 + 0.5) / 1e6)
    assert not out[day3]["is_anomaly"]          # sqrt(2) < 2
    assert out[day3]["mean_n"] == 2.0
    assert {r["is_anomaly"] for r in out.values()} == {False}


def test_cusum_changepoint_hand_case(spark):
    """Series 10,10,10,30,30 (shift after day 3): G_k = n*prefix_k - k*S
    with n=5, S=90 -> G = [-40, -80, -120, -60, 0]; the changepoint is
    day 3 (max |G| = 120), and the last day's cusum is always 0."""
    import datetime as dt

    from pyspark.sql import Row

    from ehr_ner_spark.operators.timeseries import cusum_changepoint

    rows = []
    eid = 0
    for day, cnt in enumerate([10, 10, 10, 30, 30]):
        for _ in range(cnt):
            rows.append(
                Row(
                    event_id=eid,
                    ts=dt.datetime(2024, 1, 1 + day, 12, 0, 0),
                    user_id=1,
                    event_type="view",
                    value=0.0,
                    props="{}",
                )
            )
            eid += 1
    out = sorted(cusum_changepoint(spark.createDataFrame(rows)).collect(),
                 key=lambda r: r.day)
    assert [r.cusum for r in out] == [-40, -80, -120, -60, 0]
    assert [r.is_changepoint for r in out] == [False, False, True, False, False]


def test_autocorrelation_hand_series(spark):
    """ACF arithmetic vs a NumPy re-derivation on a planted weekly
    cycle: lag-7 is the strongest positive lag."""
    import numpy as np

    from ehr_ner_spark.operators.timeseries import autocorrelation

    import datetime

    # 8 weeks of a strong 7-day cycle: weekday volume alternates 10..70
    base = datetime.datetime(2024, 1, 1)
    data = []
    for day in range(56):
        for _ in range(10 + 10 * (day % 7)):
            data.append(
                (len(data), base + datetime.timedelta(days=day), "e")
            )
    events = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string"
    )
    got = {r.lag: (r.n_pairs, r.acf_micro) for r in
           autocorrelation(events).collect()}

    x = np.array([10 + 10 * (d % 7) for d in range(56)], dtype=np.int64)
    n, s = len(x), int(x.sum())
    d = n * x - s
    den = int((d * d).sum())
    for lag in range(1, 8):
        num = int((d[:-lag] * d[lag:]).sum())
        import math

        assert got[lag] == (n - lag, math.floor(1e6 * num / den)), lag
    # weekly cycle: lag 7 positive and dominant
    assert got[7][1] > 0
    assert got[7][1] == max(v for _, v in got.values())
