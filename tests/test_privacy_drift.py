"""k-anonymity / l-diversity and distribution drift: hand-computed
semantics on tiny frames (oracle parity runs in tests/driver_compare.py;
plan shape is asserted in tests/test_plans.py)."""

from __future__ import annotations

from pyspark.sql import Row

from ehr_ner_spark.hashing import md5_60
from ehr_ner_spark.operators.dataquality import (
    DRIFT_BUCKET_CHARS,
    DRIFT_SALT,
    distribution_drift,
)
from ehr_ner_spark.operators.privacy import k_anonymity


def _cust(key, nation, seg, bal):
    return Row(
        c_custkey=key, c_name=f"c{key}", c_nationkey=nation,
        c_acctbal=float(bal), c_mktsegment=seg,
    )


def test_k_anonymity_flags_and_diversity(spark):
    """A 5-member class is k-anonymous (k=5), a singleton is not; the
    sensitive diversity counts DISTINCT priorities of the class's orders,
    and a class with no orders gets l=0."""
    cust = spark.createDataFrame(
        [_cust(i, 1, "AUTO", 1500.0) for i in range(5)]
        + [_cust(9, 2, "STEEL", 2500.0)]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=0, o_orderpriority="1-URGENT"),
            Row(o_orderkey=2, o_custkey=0, o_orderpriority="1-URGENT"),
            Row(o_orderkey=3, o_custkey=1, o_orderpriority="2-HIGH"),
        ]
    )
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in k_anonymity(cust, orders, k=5, l_div=2).collect()
    }
    big = out[(1, "AUTO")]
    assert big["class_size"] == 5 and big["k_anonymous"]
    # priorities {1-URGENT, 2-HIGH}: duplicates inside a customer collapse
    assert big["n_priorities"] == 2 and big["l_diverse"]
    single = out[(2, "STEEL")]
    assert single["class_size"] == 1 and not single["k_anonymous"]
    assert single["n_priorities"] == 0 and not single["l_diverse"]
    # $1,000 buckets: 1500.00 -> bucket 1, 2500.00 -> bucket 2
    assert big["bal_bucket"] == 1 and single["bal_bucket"] == 2


def test_k_anonymity_negative_balance_bucket(spark):
    """Negative balances floor DOWN (-0.01 -> bucket -1), matching the
    oracle's FLOOR — not an integer-division truncation toward zero."""
    cust = spark.createDataFrame([_cust(1, 1, "AUTO", -0.01)])
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=99, o_orderpriority="2-HIGH")]
    )
    row = k_anonymity(cust, orders).collect()[0]
    assert row["bal_bucket"] == -1


def test_distribution_drift_hand_counts(spark):
    """Shares/TVD recomputed by hand from the fold hash: with every doc
    the same length there is one bucket, shares are fold-count bp, and
    tvd_bp = |share_a - share_b| / 2."""
    n = 40
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=100) for i in range(n)]
    )
    rows = distribution_drift(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bucket"] == 100 // DRIFT_BUCKET_CHARS
    folds = [md5_60(f"{DRIFT_SALT}:{i}") % 2 for i in range(n)]
    n_a, n_b = folds.count(0), folds.count(1)
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    # single bucket holds 100% of each fold
    assert r["share_a_bp"] == 10000 and r["share_b_bp"] == 10000
    assert r["abs_diff_bp"] == 0 and r["tvd_bp"] == 0 and not r["drifted"]


def test_distribution_drift_disjoint_folds_max_tvd(spark):
    """Crafted lengths that separate the folds into different buckets:
    TVD reaches 10000 bp (total divergence)."""
    rows = []
    for i in range(60):
        fold = md5_60(f"{DRIFT_SALT}:{i}") % 2
        rows.append(Row(doc_id=i, n_chars=10 if fold == 0 else 200))
    out = distribution_drift(spark.createDataFrame(rows)).collect()
    assert all(r["tvd_bp"] == 10000 for r in out)
    assert all(r["drifted"] for r in out)
