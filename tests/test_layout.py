"""Z-order layout (operators/layout.py): interleave arithmetic vs a
Python bit-twiddling reference, bucket accounting, and the pruning
property the layout exists for."""

from __future__ import annotations

import datetime as dt

from ehr_ner_spark.operators.layout import (
    BUCKET_SHIFT,
    PROBE,
    Z_BITS,
    zorder_layout,
)


def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _orders(spark, rows):
    return spark.createDataFrame(
        [(i, ck, dt.datetime(1970, 1, 1) + dt.timedelta(days=d))
         for i, (ck, d) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )


def test_interleave_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (14999, 11535), (12345, 9876)]
    out = zorder_layout(_orders(spark, rows)).collect()
    got = {(r["x_min"], r["y_min"]): r["bucket"] for r in out
           if r["n_rows"] == 1}
    for ck, d in rows:
        b = _morton(ck, d) >> BUCKET_SHIFT
        if (ck, d) in got:
            assert got[(ck, d)] == b


def test_bucket_stats_and_probe(spark):
    inside = (PROBE["x_lo"] + 1, PROBE["y_lo"] + 1)
    outside = (PROBE["x_hi"] + 5000, PROBE["y_hi"] + 900)
    out = zorder_layout(_orders(spark, [inside, outside])).collect()
    assert sum(r["n_rows"] for r in out) == 2
    by_bucket = {r["bucket"]: r for r in out}
    bi = _morton(*inside) >> BUCKET_SHIFT
    bo = _morton(*outside) >> BUCKET_SHIFT
    assert by_bucket[bi]["probe_overlaps"] == 1
    assert by_bucket[bo]["probe_overlaps"] == 0


def test_zorder_prunes_most_buckets_at_sf(spark, sf_dir):
    """The reason the operator exists: on real data the probe box must
    touch a small fraction of z-buckets (2-D pruning actually works)."""
    rows = zorder_layout(
        spark.read.parquet(f"{sf_dir}/orders.parquet")
    ).collect()
    n = len(rows)
    touched = sum(r["probe_overlaps"] for r in rows)
    assert n > 0
    if n >= 16:                       # sf0.001 has enough buckets
        assert touched / n < 0.5
