"""HITS vs a pure-Python reference (same snap grid), plus MERGE-upsert and
trailing RANGE-window semantics."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ehr_ner_spark.operators.hits import HITS_ITERS, hits


def _snap(x: float, scale: int) -> float:
    return math.floor(x * float(scale) + 0.5) / float(scale)


def _ref_hits(edges: set[tuple[str, str]], iters: int):
    hubs = {d: 1.0 for d, _ in edges}
    auth: dict[str, float] = {}
    for _ in range(iters):
        auth = defaultdict(float)
        for d, e in sorted(edges):
            auth[e] += hubs[d]
        auth = {e: _snap(v, 10**9) for e, v in auth.items()}
        amax = max(auth.values())
        auth = {e: _snap(v / amax, 10**9) for e, v in auth.items()}
        hubs = defaultdict(float)
        for d, e in sorted(edges):
            hubs[d] += auth[e]
        hubs = {d: _snap(v, 10**9) for d, v in hubs.items()}
        hmax = max(hubs.values())
        hubs = {d: _snap(v / hmax, 10**9) for d, v in hubs.items()}
    out = {(d, "hub", _snap(v, 10**6)) for d, v in hubs.items()}
    out |= {(e, "authority", _snap(v, 10**6)) for e, v in auth.items()}
    return out


def test_hits_matches_reference(spark):
    edges = {
        ("d1", "apple"), ("d1", "pear"), ("d1", "plum"),
        ("d2", "apple"), ("d2", "pear"),
        ("d3", "apple"),
        ("d4", "quince"),
    }
    df = spark.createDataFrame(
        [Row(subj=d, pred="hasEntityType", obj=e) for d, e in sorted(edges)]
    )
    got = {(r.node, r.kind, r.score) for r in hits(df, iters=HITS_ITERS).collect()}
    assert got == _ref_hits(edges, HITS_ITERS)
    # the best-connected hub and the most-cited authority normalize to 1.0
    assert ("d1", "hub", 1.0) in got and ("apple", "authority", 1.0) in got


def test_hits_duplicate_triples_collapse(spark):
    # duplicate (subj, obj) rows (multiple mentions of the same surface)
    # must not double edge weight
    rows = [Row(subj="d1", pred="p", obj="x")] * 3 + [Row(subj="d2", pred="p", obj="x")]
    df = spark.createDataFrame(rows)
    got = {(r.node, r.kind, r.score) for r in hits(df, iters=1).collect()}
    assert got == _ref_hits({("d1", "x"), ("d2", "x")}, 1)


def test_merge_upsert_semantics(spark, sf_dir):
    from ehr_ner_spark.entrypoints import QUERIES_REGISTRY

    out = QUERIES_REGISTRY["rel_merge_upsert"](spark, sf_dir)
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_base = base.count()
    n_upd = base.where(F.col("o_orderkey") % 7 == 0).count()
    n_ins = base.where(F.col("o_orderkey") % 97 == 0).count()
    by_action = {r["action"]: r["n"] for r in
                 out.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_action == {
        "upd": n_upd, "ins": n_ins, "keep": n_base - n_upd,
    }
    # keys stay unique after the merge
    assert out.select("o_orderkey").distinct().count() == n_base + n_ins
    # an updated row carries the delta version
    r = out.where((F.col("o_orderkey") % 7 == 0)
                  & (F.col("o_orderkey") < 10000000)).first()
    assert r["o_orderstatus"] == "U" and r["action"] == "upd"


def test_sliding_window_matches_bruteforce(spark):
    import datetime as dt

    from ehr_ner_spark.entrypoints import SLIDE_MICROS

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: bursts 0s, 30s, 9m59s, 10m1s; tie pair at 20m
        (0, 1, 0.10, 0), (1, 1, 0.20, 30), (2, 1, 0.40, 599),
        (3, 1, 0.80, 601), (4, 1, 1.60, 1200), (5, 1, 3.20, 1200),
        # user 2: single event
        (6, 2, 9.99, 50),
    ]
    df = spark.createDataFrame(
        [Row(event_id=i, user_id=u, value=v, ts=t0 + dt.timedelta(seconds=s))
         for i, u, v, s in rows]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-SLIDE_MICROS, 0)
    )
    got = {
        (r.event_id, r.n_10m, r.cents_10m)
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_10m"),
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
            .alias("cents_10m"),
        ).collect()
    }
    want = set()
    for i, u, v, s in rows:
        peers = [(i2, v2) for i2, u2, v2, s2 in rows
                 if u2 == u and s - 600 <= s2 <= s]
        want.add((i, len(peers),
                  sum(round(v2 * 100) for _, v2 in peers)))
    assert got == want
