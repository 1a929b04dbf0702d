"""k-anonymity / l-diversity and distribution drift: hand-computed
semantics on tiny frames (oracle parity runs in tests/driver_compare.py;
plan shape is asserted in tests/test_plans.py)."""

from __future__ import annotations

import math

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


def test_ks_drift_disjoint_folds_max_gap(spark):
    """Fold-0 docs all shorter than fold-1 docs: the truncated CDF gap
    peaks at 10000 bp at the fold-0 length."""
    from ehr_ner_spark.operators.dataquality import KS_SALT, ks_drift

    rows = []
    for i in range(60):
        fold = md5_60(f"{KS_SALT}:{i}") % 2
        rows.append(Row(doc_id=i, n_chars=10 if fold == 0 else 200))
    out = ks_drift(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ks_bp"] == 10000 and r["ks_at_chars"] == 10
    assert r["n_lengths"] == 2
    assert r["tot_a"] + r["tot_b"] == 60


def test_ks_drift_identical_distributions_zero(spark):
    """Both folds all the same length: CDFs coincide (10000 vs 10000 at
    the single support point), KS = 0."""
    from ehr_ner_spark.operators.dataquality import ks_drift

    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=100) for i in range(40)]
    )
    r = ks_drift(docs).collect()[0]
    assert r["ks_bp"] == 0 and r["ks_at_chars"] == 100
    assert r["n_lengths"] == 1


def test_ks_drift_empty_fold_reads_10000(spark):
    """Anything vs an empty fold: the empty fold's CDF is all-zero by
    definition, so KS = 10000."""
    from ehr_ner_spark.operators.dataquality import KS_SALT, ks_drift

    ids = [i for i in range(200) if md5_60(f"{KS_SALT}:{i}") % 2 == 0][:20]
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=50 + i) for i in ids]
    )
    r = ks_drift(docs).collect()[0]
    assert r["ks_bp"] == 10000
    assert r["tot_b"] == 0 and r["tot_a"] == 20


def test_ks_drift_matches_python_replication(spark):
    """KS recomputed in pure Python from the fold hash and bp-truncated
    CDFs on a ragged length mix."""
    from ehr_ner_spark.operators.dataquality import KS_SALT, ks_drift

    lengths = [10, 10, 25, 40, 40, 40, 77, 90, 90, 123, 123, 200, 350, 350]
    rows = [Row(doc_id=i, n_chars=n) for i, n in enumerate(lengths)]
    folds = {i: md5_60(f"{KS_SALT}:{i}") % 2 for i in range(len(lengths))}
    from collections import Counter

    ca, cb = Counter(), Counter()
    for i, n in enumerate(lengths):
        (ca if folds[i] == 0 else cb)[n] += 1
    tot_a, tot_b = sum(ca.values()), sum(cb.values())
    cum_a = cum_b = 0
    best = (-1, None)
    for x in sorted(set(lengths)):
        cum_a += ca[x]
        cum_b += cb[x]
        da = 0 if tot_a == 0 else math.floor(10000 * cum_a / tot_a)
        db = 0 if tot_b == 0 else math.floor(10000 * cum_b / tot_b)
        diff = abs(da - db)
        if diff > best[0]:
            best = (diff, x)
    r = ks_drift(spark.createDataFrame(rows)).collect()[0]
    assert (r["ks_bp"], r["ks_at_chars"]) == best
    assert r["n_lengths"] == len(set(lengths))
