"""FD audit (operators/dataquality.py): hand-checked g3 arithmetic and
violation counts on a constructed table, plus the FDS wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_ner_spark.operators.dataquality import _audit_one, fd_violations


def test_audit_hand_case(spark):
    # key 1: y in {a, a, b}  -> 1 violating row (delete one 'b')
    # key 2: y = {c}         -> clean
    # key 3: y in {d, e}     -> 1 violating row
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e")],
        "k long, v string",
    )
    r = _audit_one(df, "t.k->v", "k", "v").collect()[0]
    assert r["fd"] == "t.k->v"
    assert r["n_keys"] == 3
    assert r["n_violating_keys"] == 2
    assert r["n_rows"] == 6
    assert r["n_violating_rows"] == 2
    assert r["g3_error"] == 0.333333            # floor(2/6*1e6+0.5)/1e6


def test_fd_violations_unique_key_is_clean(spark, sf_dir):
    rows = {r["fd"]: r for r in fd_violations({
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "events": spark.read.parquet(f"{sf_dir}/events.parquet"),
    }).collect()}
    assert len(rows) == 3
    # c_custkey is unique, so the FD holds exactly
    clean = rows["customer.c_custkey->c_mktsegment"]
    assert clean["n_violating_keys"] == 0 and clean["g3_error"] == 0.0
    # user behaviour is not functional in event_type
    dirty = rows["events.user_id->event_type"]
    assert dirty["n_violating_rows"] > 0 and dirty["g3_error"] > 0.0


def test_benford_hand_case(spark):
    """60 amounts with first digits forced: 30x d=1, 20x d=2, 10x d=9.
    Shares are integer basis points; expectations are the embedded
    literals; dev_bp is the absolute gap."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.dataquality import BENFORD_BP, benford_audit

    amounts = [1.23] * 30 + [25.0] * 20 + [999.99] * 10
    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_totalprice=a) for i, a in enumerate(amounts)]
    )
    got = {r.digit: r for r in benford_audit(orders).collect()}
    assert set(got) == {1, 2, 9}
    assert got[1].n == 30 and got[1].share_bp == 5000
    assert got[2].n == 20 and got[2].share_bp == 3333
    assert got[9].n == 10 and got[9].share_bp == 1666
    assert got[1].expected_bp == BENFORD_BP[0]
    assert got[9].dev_bp == abs(1666 - BENFORD_BP[8])


def test_benford_cents_not_float_digits(spark):
    """The digit comes from exact ROUND half-away cents: 0.095 -> 10
    cents -> digit 1 (a float substring would read '9' or '0')."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.dataquality import benford_audit

    orders = spark.createDataFrame([Row(o_orderkey=0, o_totalprice=0.095)])
    [r] = benford_audit(orders).collect()
    assert r.digit == 1 and r.n == 1


def test_split_leakage_matches_recomputed_folds(spark, sf_dir):
    """Every (split_lo, split_hi) group count must equal the brute
    recomputation from the pairs frame + the hash split, and leaky mark
    exactly the cross-fold rows."""
    import hashlib
    from collections import Counter

    from ehr_ner_spark.operators.dataquality import split_leakage
    from ehr_ner_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.split_lo, r.split_hi): (r.n_pairs, r.leaky)
        for r in split_leakage(docs).collect()
    }

    def split_of(doc_id):
        b = int(hashlib.md5(f"cv:{doc_id}".encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    want = Counter()
    for r in minhash_lsh_pairs(docs).collect():
        lo, hi = sorted((split_of(r.src), split_of(r.dst)))
        want[(lo, hi)] += 1
    assert {k: v for k, (v, _) in got.items()} == dict(want)
    assert all(leaky == (lo != hi) for (lo, hi), (_, leaky) in got.items())


def test_fk_discovery_verdicts(spark):
    """All 7 true TPC-H FKs hold (0 orphans, containment 1.0); both
    planted negatives are rejected with the orphan counts a direct
    set-difference predicts."""
    from ehr_ner_spark.operators.dataquality import FK_CANDIDATES, fk_discovery

    sf = "/root/testdata/sf0.001"
    names = {t for c in FK_CANDIDATES for t in (c[0], c[2])}
    tables = {t: spark.read.parquet(f"{sf}/{t}.parquet") for t in names}
    rows = {(r.child, r.parent): r for r in fk_discovery(tables).collect()}
    assert len(rows) == 9

    for ct, cc, pt, pc in FK_CANDIDATES:
        child = {x[0] for x in tables[ct].select(cc).collect()
                 if x[0] is not None}
        parent = {x[0] for x in tables[pt].select(pc).collect()
                  if x[0] is not None}
        r = rows[(f"{ct}.{cc}", f"{pt}.{pc}")]
        assert r.n_child_keys == len(child)
        assert r.n_orphans == len(child - parent)
        assert r.is_fk == (len(child - parent) == 0)
    n_true = sum(1 for r in rows.values() if r.is_fk)
    assert n_true == 7
