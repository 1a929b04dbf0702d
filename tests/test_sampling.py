"""Stratified sampling + sequence packing + decontamination semantics and
plan-shape tests (oracle parity runs in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_ner_spark.operators.dedup import decontaminate
from ehr_ner_spark.operators.sampling import pack_sequences, stratified_sample


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 500000, "de": 200000}
    s1 = stratified_sample(docs, rates, default_ppm=0)
    rows = s1.collect()
    # only the configured strata survive with default 0
    assert {r.stratum for r in rows} <= {"en", "de"}
    # empirical rate within a loose binomial band (small n)
    n_en = docs.where(F.col("lang") == "en").count()
    k_en = sum(1 for r in rows if r.stratum == "en")
    assert 0.30 <= k_en / n_en <= 0.70
    # determinism: bit-identical sample on re-run
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in rows
    )
    # the kept set is a SUBSET under a lower rate (nested samples — the
    # property hash-threshold sampling has and rand()-sampling lacks)
    s_lo = stratified_sample(docs, {"en": 200000}, default_ppm=0)
    lo_ids = {r.doc_id for r in s_lo.collect()}
    hi_ids = {r.doc_id for r in rows if r.stratum == "en"}
    assert lo_ids <= hi_ids


def test_stratified_sample_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(stratified_sample(docs, {"en": 500000}))
    # no hash/range shuffle, no Python: a pure projection + filter
    assert "hashpartitioning" not in plan
    assert "RangePartitioning" not in plan
    assert "Python" not in plan


def test_pack_sequences_matches_serial_cumsum(spark):
    rows = [(i * 7 % 95, "tok " * (i % 9)) for i in range(60)]  # shuffled ids
    docs = spark.createDataFrame(
        [(i, t) for i, t in {i: t for i, t in rows}.items()],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pack_sequences(docs, chunk=10).collect()}
    serial = sorted((r.doc_id, r.n_tokens) for r in
                    pack_sequences(docs, chunk=10)
                    .select("doc_id", "n_tokens").collect())
    off = 0
    for doc_id, n_tok in serial:
        r = got[doc_id]
        assert r.start_tok == off, (doc_id, r.start_tok, off)
        assert r.seq_first == off // 10
        assert r.seq_last == (off + max(n_tok, 1) - 1) // 10
        off += n_tok


def test_pack_sequences_bucket_width_invariant(spark, sf_dir):
    """The distributed two-level prefix sum is bucket-decomposition
    independent — the defining property of a correct parallel scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, chunk=512, bucket_width=16).collect()))
    b = sorted(map(tuple, pack_sequences(docs, chunk=512, bucket_width=4096).collect()))
    assert a == b


def test_pack_sequences_no_global_window_over_corpus(spark, sf_dir):
    """The only non-partitioned window sort runs over the per-bucket totals
    frame, never the document stream: the corpus-side window is keyed by
    _bkt, and the bucket-offsets join is broadcast."""
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(pack_sequences(docs, chunk=2048))
    assert "BroadcastHashJoin" in plan
    # physical Window nodes print as `Window [exprs], [partition], [order]`;
    # every window ordered over the document stream (doc_id) must carry a
    # _bkt partition spec — an unpartitioned doc_id window is the global
    # single-partition sort this test exists to forbid
    doc_windows = [
        ln for ln in plan.splitlines()
        if "Window [" in ln and "doc_id#" in ln
    ]
    assert doc_windows, "expected a corpus-side window over doc_id"
    for ln in doc_windows:
        assert re.search(r"\], \[_bkt#\d+L?\], \[doc_id#", ln), ln


def test_decontaminate_semantics(spark):
    bench_id, clean_id, contam_id = 97, 1, 2  # 97 % 97 == 0 -> benchmark
    docs = spark.createDataFrame(
        [
            (bench_id, "alpha beta gamma delta epsilon"),
            (contam_id, "alpha beta gamma delta zeta"),  # shares 2 shingles
            (clean_id, "one two three four five"),
            (3, "alpha beta gamma nope nope"),  # shares only 1 shingle
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hits for r in decontaminate(docs, n=3, min_hits=2).collect()}
    assert got == {contam_id: 2}
    plan = _plan(decontaminate(docs, n=3, min_hits=2))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_crossval_split_semantics(spark, sf_dir):
    import hashlib

    from ehr_ner_spark.operators.sampling import crossval_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = crossval_split(docs).collect()
    assert len(rows) == docs.count()  # exactly one split per doc
    # bucket matches the pure-Python hash discipline
    for r in rows[:50]:
        b = int(hashlib.md5(f"cv:{r.doc_id}".encode()).hexdigest()[:15], 16) % 100
        assert r.bucket == b
        assert r.split == ("train" if b < 80 else "val" if b < 90 else "test")
    # rough 80/10/10 at small n
    n = len(rows)
    k_train = sum(1 for r in rows if r.split == "train")
    assert 0.65 <= k_train / n <= 0.95
    # append stability: splitting HALF the corpus assigns identically
    half = crossval_split(docs.where(F.col("doc_id") % 2 == 0)).collect()
    full_map = {r.doc_id: r.split for r in rows}
    assert all(full_map[r.doc_id] == r.split for r in half)


def test_crossval_split_is_map_only(spark, sf_dir):
    from ehr_ner_spark.operators.sampling import crossval_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(crossval_split(docs))
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_temperature_mixture_allocation(spark, sf_dir):
    import math

    from ehr_ner_spark.operators.sampling import temperature_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = temperature_mixture(docs, budget=60).collect()
    counts = {r.lang: c for r, c in (
        (r, r["count"]) for r in docs.groupBy("lang").count().collect())}
    w = {s: math.isqrt(n) for s, n in counts.items()}
    sum_w = sum(w.values())
    expect_quota = {s: (60 * ws) // sum_w for s, ws in w.items()}
    got = {}
    for r in rows:
        got.setdefault(r.stratum, []).append(r)
        assert r.quota == expect_quota[r.stratum]
    # exactly quota rows per stratum, never over budget in total
    for s, members in got.items():
        assert len(members) == expect_quota[s]
    assert len(rows) <= 60
    # temperature flattens: the share of the largest stratum shrinks
    big = max(counts, key=counts.get)
    assert expect_quota[big] / 60 < counts[big] / sum(counts.values()) + 1e-9


def test_weighted_reservoir_two_phase_equals_global_topk(spark, sf_dir):
    """The salted two-phase rank must equal the plain per-stratum top-k
    over the same deterministic keys (recomputed here in pandas), and the
    ranking must be weight-aware: every kept doc beats every dropped doc
    of its stratum on (key_nano, doc_id)."""
    import hashlib
    import math

    from ehr_ner_spark.operators.sampling import (
        RESERVOIR_K,
        weighted_reservoir,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = weighted_reservoir(docs).toPandas()

    pdf = docs.select("doc_id", "lang", "text").toPandas()

    def key_nano(doc_id, text):
        h = int(
            hashlib.md5(f"ares:{doc_id}".encode()).hexdigest()[:15], 16
        )
        w = len(text.split(" "))
        k = math.log((h + 1) / float(1 << 60)) / w * 1e9
        return math.floor(k + 0.5) if k >= 0 else -math.floor(-k + 0.5)

    pdf["key_nano"] = [
        key_nano(d, t) for d, t in zip(pdf.doc_id, pdf.text)
    ]
    want = {}
    for lang, grp in pdf.groupby("lang"):
        ordered = grp.sort_values(
            ["key_nano", "doc_id"], ascending=[False, True]
        )
        want[lang] = list(ordered.doc_id.head(RESERVOIR_K))
    for lang, grp in got.groupby("stratum"):
        ordered = grp.sort_values("rnk")
        assert list(ordered.doc_id) == want[lang]


def test_weighted_reservoir_small_stratum_keeps_all(spark):
    """A stratum with fewer rows than k returns every row, ranked."""
    from pyspark.sql import Row

    from ehr_ner_spark.operators.sampling import weighted_reservoir

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, lang="xx", source="s", n_chars=9,
                text="a few words here")
            for i in range(3)
        ]
    )
    out = weighted_reservoir(docs).toPandas()
    assert len(out) == 3
    assert sorted(out.rnk) == [1, 2, 3]


def test_weighted_reservoir_stage1_uses_group_limit(spark, sf_dir):
    """The constant rank cap must install WindowGroupLimit (map-side
    heaps) so no (stratum, salt) slice is ever fully materialized-sorted
    past its top-k."""
    from ehr_ner_spark.operators.sampling import weighted_reservoir

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        weighted_reservoir(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
