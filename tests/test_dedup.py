"""Dedup family correctness: exact groups, MinHash-LSH vs brute force,
SimHash Hamming pairs vs brute force."""

from __future__ import annotations

import itertools
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ehr_ner_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)
from ehr_ner_spark.operators.linking import shingles

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),     # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),     # near dup
    (3, "spark window functions shuffle partitions nicely"),
    (4, "spark window functions shuffle partitions nicely today"),  # near dup of 3
    (5, "completely different content about databases"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r.doc_id: (r.canonical_doc_id, r.group_size) for r in exact_dedup(docs).collect()}
    assert out[0] == (0, 2) and out[1] == (0, 2)
    assert out[3] == (3, 1)
    assert len(out) == 6


def test_minhash_clusters_match_bruteforce(spark, docs):
    threshold = 0.6

    def jac(a, b):
        sa, sb = set(shingles(a)), set(shingles(b))
        return len(sa & sb) / len(sa | sb)

    # brute-force union-find over doc texts
    parent = {i: i for i, _ in DOCS}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for (i, a), (j, b) in itertools.combinations(DOCS, 2):
        if jac(a, b) >= threshold:
            parent[max(find(i), find(j))] = min(find(i), find(j))
    expected = {}
    for i, _ in DOCS:
        expected.setdefault(find(i), set()).add(i)
    expected_clusters = {frozenset(v) for v in expected.values()}

    got = {}
    for r in minhash_lsh_dedup(docs, threshold=threshold).collect():
        got.setdefault(r.component, set()).add(r.doc_id)
    got_clusters = {frozenset(v) for v in got.values()}
    assert got_clusters == expected_clusters


def test_simhash_pairs_match_bruteforce(spark, docs):
    max_h = 8
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    def pop(x):
        return bin(x & ((1 << 64) - 1)).count("1")

    # brute force: pairs within Hamming<=max_h whose simhashes share a 15-bit band
    expected = set()
    for i, j in itertools.combinations(sorted(sh), 2):
        h = pop(sh[i] ^ sh[j])
        shares_band = any(
            ((sh[i] >> (15 * b)) & 0x7FFF) == ((sh[j] >> (15 * b)) & 0x7FFF)
            for b in range(4)
        )
        if h <= max_h and shares_band:
            expected.add((i, j, h))
    got = {(r.src, r.dst, r.hamming) for r in simhash_dedup(docs, max_hamming=max_h).collect()}
    assert got == expected
    # identical docs: Hamming 0, always found
    assert (0, 1, 0) in got


def test_simhash_deterministic(spark, docs):
    a = {r.doc_id: r.simhash for r in simhash(docs.repartition(1)).collect()}
    b = {r.doc_id: r.simhash for r in simhash(docs.repartition(5)).collect()}
    assert a == b


def test_ngram_jaccard_values(spark, docs):
    got = {(r.src, r.dst): r.jaccard for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    # exact dups: J=1.0
    assert got[(0, 1)] == 1.0
    # doc 3 vs 4: 4 shingles vs 5, 4 common -> J = 4/5 = 0.8
    assert got[(3, 4)] == 0.8
    assert (0, 5) not in got


def test_minhash_lsh_pairs_builtin(spark, docs):
    """The built-ins MinHash LSH path (md5-60bit + universal-hash perms):
    exact duplicates are ALWAYS found (identical signatures -> identical
    bands); any reported pair carries its exact word-3-shingle Jaccard
    (partial-band recall below J=1 is probabilistic by design — the oracle
    parity test pins the exact candidate set)."""
    from ehr_ner_spark.operators.dedup import minhash_lsh_pairs

    got = {(r.src, r.dst): r.jaccard for r in minhash_lsh_pairs(docs, threshold=0.3).collect()}
    assert got[(0, 1)] == 1.0          # exact dup: identical signatures
    if (3, 4) in got:                  # near dup: J = 4/5 when banded together
        assert got[(3, 4)] == 0.8
    assert (0, 5) not in got


def test_minhash_signatures_deterministic(spark, docs):
    from ehr_ner_spark.operators.dedup import minhash_signatures

    a = sorted(map(tuple, minhash_signatures(docs.repartition(1)).collect()))
    b = sorted(map(tuple, minhash_signatures(docs.repartition(5)).collect()))
    assert a == b
    # 16 perms per doc (docs with >= 3 words)
    per_doc = {}
    for doc_id, perm, mh in a:
        per_doc.setdefault(doc_id, set()).add(perm)
    assert all(perms == set(range(16)) for perms in per_doc.values())


def test_containment_detects_inclusion(spark):
    """A document fully shingle-contained in a longer one scores c_src=1.0
    even though Jaccard is below 1 — the asymmetric inclusion signal."""
    from ehr_ner_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h x y"),
            (3, "q r s t u v w zz"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.src, r.dst): r for r in
            containment_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r.c_src == 1.0          # every shingle of doc1 appears in doc2
    assert r.c_dst < 1.0           # but not vice versa
    assert all(k != (1, 3) and k != (2, 3) for k in rows)


def test_simhash_clusters_consistent_with_pairs(spark, sf_dir):
    from ehr_ner_spark.operators.dedup import simhash_clusters, simhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = {r.doc_id: r.cluster_id for r in simhash_clusters(docs).collect()}
    assert len(clusters) == docs.count()  # one row per document
    # every verified near-dup pair lands in one cluster
    pairs = simhash_dedup(docs).collect()
    for p in pairs:
        assert clusters[p.src] == clusters[p.dst]
    # cluster id is the min member id, keep iff representative
    rows = simhash_clusters(docs).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        assert all(m.n_members == len(members) for m in members)
        assert sum(m.keep for m in members) == 1


def test_lsh_recall_eval_semantics(spark, sf_dir):
    from ehr_ner_spark.entrypoints import QUERIES_REGISTRY

    out = QUERIES_REGISTRY["ds_lsh_recall_eval"](spark, sf_dir).collect()
    assert out, "truth set empty — threshold too high for the fixture"
    # banding at 4 bands x 4 rows catches most >=0.5 pairs
    recall = sum(r.caught for r in out) / len(out)
    assert recall >= 0.5
    # pair keys are canonical and unique
    keys = [(r.src, r.dst) for r in out]
    assert len(keys) == len(set(keys))
    assert all(s < d for s, d in keys)


def test_minhash_estimate_bounds_and_band_floor(spark, sf_dir):
    from ehr_ner_spark.entrypoints import QUERIES_REGISTRY

    rows = QUERIES_REGISTRY["ds_minhash_estimate"](spark, sf_dir).collect()
    assert rows, "no verified pairs in the fixture"
    for r in rows:
        # a banded candidate shares at least one full band (4 perms)
        assert 4 <= r.est_16 <= 16


def test_keep_policy_longest_wins(spark, sf_dir):
    from ehr_ner_spark.entrypoints import QUERIES_REGISTRY

    rows = QUERIES_REGISTRY["ds_keep_policy"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars").collect()
    }
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for gid, members in by_group.items():
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1
        best = max(members, key=lambda m: (docs[m.doc_id], -m.doc_id))
        assert keeps[0].doc_id == best.doc_id
        assert all(m.group_size == len(members) for m in members)


def test_segment_dedup_keeps_global_first(spark):
    """The globally-first occurrence of a repeated segment survives; every
    later occurrence (same doc or later doc) is dropped; doc text is
    rebuilt in segment order."""
    from ehr_ner_spark.operators.dedup import segment_dedup

    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    c = " ".join(f"c{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (10, f"{a} {b}"),          # first occurrence of a and b
            (20, f"{b} {c} {a}"),      # b and a are repeats, c is new
            (30, f"{c}"),              # repeat of c -> fully deduped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert got[10]["text_dedup"] == f"{a} {b}" and got[10]["n_kept"] == 2
    assert got[20]["text_dedup"] == c and got[20]["n_kept"] == 1
    assert got[30]["text_dedup"] == "" and got[30]["n_kept"] == 0
    assert got[20]["n_segs"] == 3 and got[30]["n_segs"] == 1


def test_segment_dedup_short_tail_segment(spark):
    """A trailing segment shorter than SEG_WORDS is still a dedup unit."""
    from ehr_ner_spark.operators.dedup import segment_dedup

    seg = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, f"{seg} tail words"), (2, "tail words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    # "tail words" first occurs as doc 1's trailing segment
    assert got[1]["text_dedup"] == f"{seg} tail words"
    assert got[2]["n_kept"] == 0 and got[2]["text_dedup"] == ""


def test_segment_dedup_first_key_is_partial_aggregate(spark, sf_dir):
    """The first-occurrence winner must be a combinable min aggregate
    (map-side partials), never a window over the segment key."""
    from ehr_ner_spark.operators.dedup import segment_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = segment_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "min(" in plan


def test_prefix_filter_matches_bruteforce(spark, docs):
    """Prefix filtering + length filter must find EXACTLY the pairs exact
    all-pairs 3-gram Jaccard >= t finds (losslessness)."""
    from ehr_ner_spark.operators.dedup import prefix_filter_pairs

    t = 0.5
    got = {
        (r.src, r.dst): (r.n_common, r.jaccard)
        for r in prefix_filter_pairs(docs, n=3, threshold=t).collect()
    }

    def sh3(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {d: sh3(txt) for d, txt in DOCS if len(txt.split(" ")) >= 3}
    want = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                want[(a, b)] = (inter, round(inter / union, 6))
    assert got == want and len(want) > 0


def test_prefix_filter_threshold_sweep(spark, docs):
    """Losslessness holds across thresholds (the prefix length formula
    |s| - ceil(t|s|) + 1 depends on t)."""
    from ehr_ner_spark.operators.dedup import prefix_filter_pairs

    def sh3(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {d: sh3(txt) for d, txt in DOCS if len(txt.split(" ")) >= 3}
    for t in (0.3, 0.7, 0.9):
        got = {(r.src, r.dst) for r in
               prefix_filter_pairs(docs, n=3, threshold=t).collect()}
        want = set()
        for a in sorted(sets):
            for b in sorted(sets):
                if a >= b:
                    continue
                union = len(sets[a] | sets[b])
                if union and len(sets[a] & sets[b]) / union >= t:
                    want.add((a, b))
        assert got == want, f"threshold {t}"


def test_prefix_lemma_fuzz():
    """Property fuzz of the losslessness lemma the engine's blocking
    relies on: for ANY token universe, ANY df-consistent total order and
    ANY threshold, two sets with Jaccard >= t share a token within their
    |s| - ceil(t|s|) + 1 prefixes (Bayardo et al.'s prefix filtering)."""
    import math
    import random

    rng = random.Random(20260820)
    for trial in range(300):
        t = rng.choice([0.3, 0.5, 0.7, 0.8, 0.9])
        universe = list(range(rng.randint(4, 40)))
        a = set(rng.sample(universe, rng.randint(1, len(universe))))
        # build b as a perturbation of a so high-Jaccard pairs occur often
        b = set(a)
        for _ in range(rng.randint(0, 6)):
            if b and rng.random() < 0.5:
                b.discard(rng.choice(sorted(b)))
            else:
                b.add(rng.choice(universe))
        if not b:
            continue
        inter = len(a & b)
        union = len(a | b)
        if inter / union < t:
            continue
        # df-consistent global order: random tie-broken frequency order
        order = {tok: (rng.random(), tok) for tok in universe}
        sa = sorted(a, key=lambda x: order[x])
        sb = sorted(b, key=lambda x: order[x])
        pa = sa[: len(sa) - math.ceil(t * len(sa)) + 1]
        pb = sb[: len(sb) - math.ceil(t * len(sb)) + 1]
        assert set(pa) & set(pb), (
            f"lemma violated: t={t} a={sa} b={sb} prefixes {pa}/{pb}"
        )


def test_cdc_chunks_shift_robustness(spark):
    """The CDC property: prepending words to a document changes only the
    chunks before the first surviving boundary — later chunks re-align
    byte-for-byte, while fixed-width segmentation of the same pair shares
    (almost) nothing."""
    from ehr_ner_spark.operators.dedup import cdc_chunks

    base = " ".join(f"tok{i * 7 % 101}word{i}" for i in range(120))
    shifted = "inserted preamble words here " + base
    docs2 = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs2).collect()
    shas = {0: set(), 1: set()}
    for r in rows:
        shas[r.doc_id].add(r.chunk_sha)
    common = shas[0] & shas[1]
    # most chunks re-align despite the 4-word prepend
    assert len(common) >= max(1, len(shas[0]) // 2), (
        len(common), len(shas[0]), len(shas[1]))

    # fixed-width 8-word segmentation shares no segment (4-word shift)
    def fixed(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 8]) for i in range(0, len(w), 8)}

    assert not (fixed(base) & fixed(shifted))

    # corpus copy counts: every shared chunk reports n_copies == 2
    by_sha = {}
    for r in rows:
        by_sha.setdefault(r.chunk_sha, []).append(r.n_copies)
    for sha in common:
        assert all(c == 2 for c in by_sha[sha])


def test_cdc_chunks_partition_words_exactly(spark):
    """Chunks partition each document: n_words sums to the word count and
    chunk indices are dense from 0."""
    from ehr_ner_spark.operators.dedup import cdc_chunks

    docs2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = cdc_chunks(docs2).collect()
    agg = {}
    for r in rows:
        agg.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_words))
    texts = {r.doc_id: r.text for r in docs2.select("doc_id", "text").collect()}
    assert set(agg) == set(texts)
    for d, chunks in agg.items():
        chunks.sort()
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert sum(c[1] for c in chunks) == len(texts[d].split(" "))


def test_bbit_minhash_estimator_hand_math(spark, docs):
    """agree/est relationship and the debias clamp: est = max(0,
    2*agree/16 - 1), and exact-dup pairs (identical text) agree on all 16
    bits with est 1.0."""
    from ehr_ner_spark.operators.dedup import bbit_minhash_audit

    rows = bbit_minhash_audit(docs, threshold=0.4).collect()
    assert rows
    for r in rows:
        assert 0 <= r.agree_1bit <= 16
        assert r.est_1bit == max(0.0, 2 * r.agree_1bit / 16.0 - 1.0)
    exact_pairs = [r for r in rows if (r.src, r.dst) == (0, 1)]
    assert exact_pairs and exact_pairs[0].agree_1bit == 16
    assert exact_pairs[0].est_1bit == 1.0


def test_lsh_scurve_theory_and_monotone_capture(spark, sf_dir):
    """theory_mid must equal the closed-form 1-(1-s^4)^4 at midpoints;
    empirical capture must be ~0 at the bottom decile and total at the
    top (4x4 banding: p(0.95)=0.9988, and every >=0.9 pair here is
    band-captured); rates must be monotone with the bucket."""
    import math

    from ehr_ner_spark.operators.dedup import lsh_scurve

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(lsh_scurve(docs).collect(), key=lambda r: r["bucket"])
    assert rows, "no overlap pairs at all?"
    for r in rows:
        s = (r["bucket"] + 0.5) / 10.0
        want = 1.0 - (1.0 - s ** 4) ** 4
        assert abs(r["theory_mid"] - want) < 2e-6
        assert 0 <= r["n_captured"] <= r["n_pairs"]
    rates = [r["capture_rate"] for r in rows]
    assert rates == sorted(rates)
    assert rows[0]["bucket"] == 0 and rates[0] < 0.01
    assert rows[-1]["bucket"] == 9 and rates[-1] == 1.0
