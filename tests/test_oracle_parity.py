"""Mimics the driver's correctness gate: run every ``queries()`` entry under
Spark AND its ``oracle_sql()`` twin under DuckDB on the same parquet tables;
compare row count, column names, and order-insensitive values.

Runs at sf0.001 in CI for speed (the driver uses sf0.01; set
SPARK_GRAFT_TEST_SF_DIR to override).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: total order even with None/mixed types in grouping
    # columns (rollup rows)
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


# Queries whose oracle claims BIT-EXACT equality (integer/string outputs,
# or doubles that are exact by construction — int sums / exact counts).
# The remaining oracles go through the round-6/%.6g float normalization
# because their doubles are sums whose accumulation order is engine-owned.
EXACT_QUERIES = {
    "kg_corpus_sha", "kg_mentions", "kg_triples", "kg_canonical_triples",
    "kg_sl_mentions", "kg_featurize", "kg_gold_mentions", "kg_priority_flat",
    "kg_nested_minus_flat",
    "kg_triples_resumed", "kg_mentions_stream", "kg_train_tagger",
    "kg_trained_mentions", "ds_curation_pipeline",
    "ds_exact_dedup", "ds_token_stats", "ds_fingerprint", "ds_lang_id",
    "ds_simhash_pairs", "ds_minhash_sig", "ds_minhash_dedup",
    "ds_stratified_sample", "ds_pack_sequences", "ds_decontaminate",
    "mm_frames", "mm_features",
    # sketch family: integer state end to end; the one float per query is a
    # single IEEE division snapped to the 1e-6 grid on both sides
    "ds_heavy_hitters", "ds_hll_distinct", "ds_bloom_membership",
    # integer BFS distances / one snapped small-integer division
    "kg_shortest_paths", "kg_link_prediction",
    # hash-greedy walks: md5-hex string MINs + integer steps/counts
    "kg_random_walks", "kg_walk_skipgrams",
    # value-histogram quantiles: integer counts + integer ceil-division
    "ds_length_quantiles",
    # incremental == full recompute: strings + integer spans end to end
    "kg_incremental_triples",
    # cluster purity: integer counts + one snapped division
    "kg_cluster_purity",
    # cohort retention: integer week indices + one snapped division
    "rel_cohort_retention",
    # BM25 / bigram LM: integer micro-score sums + one or two IEEE
    # divisions written identically on both sides
    "ds_bm25_topk", "ds_bigram_lm_score",
    # SCD2: timestamps/strings/ints/bool only
    "rel_scd2_history",
    # containment/semantic-dedup/snippets: integer counts + snapped
    # divisions, or strings/ints/bool only
    "ds_minhash_containment", "ds_semantic_dedup", "kg_mention_snippets",
    # feature hashing / incremental agg: pure integers (+ timestamps)
    "ds_feature_hash_embed", "rel_incremental_agg",
    # ensemble vote: strings + integer span indices + integer votes
    "kg_ensemble_mentions",
    # substring spans / phrase hits / quota sample: pure integers + strings
    "ds_substring_dedup", "ds_phrase_search", "ds_quota_sample",
    # MERGE upsert: pass-through doubles (+100.0 is IEEE-exact); sliding
    # window: integer counts + cent sums
    "rel_merge_upsert", "rel_sliding_window",
    # partition-pruned day scan: integer counts + cent sums
    "rel_partitioned_scan",
    # sign projection: literal cast-and-add chains, identical fold order;
    # kNN accuracy: integers + one snapped division
    "ds_random_projection", "ds_knn_accuracy",
    # simhash clusters / cv split / set ops / gap fill: ints + strings only
    "ds_simhash_clusters", "ds_crossval_split", "rel_set_ops", "rel_gap_fill",
    # vocab coverage / relation cardinality: ints + strings only
    "ds_vocab_coverage", "kg_relation_cardinality",
    # IQR fences / span conflicts: ints + strings only
    "ds_iqr_classify", "kg_span_conflicts",
    # LM buckets (integer fluency key) / LSH recall audit (ids + bool)
    "ds_lm_buckets", "ds_lsh_recall_eval",
    # ego networks: strings + integer hops
    "kg_ego_networks",
    # alias dictionary: strings + integer counts + bool
    "kg_alias_dictionary",
    # fertility (BIGINT floor division) / dedup report card: all integer
    "ds_tokenizer_fertility", "ds_dup_cluster_stats",
    # temperature mixture (IEEE-exact sqrt floor) / degree histogram
    "ds_temperature_mixture", "kg_degree_distribution",
    # lang-ID confusion matrix / minhash agree-count audit: all integer
    "ds_lang_confusion", "ds_minhash_estimate",
    # keep policy (packed integer max) / shard manifest: all integer
    "ds_keep_policy", "ds_shard_manifest",
    # inter-model agreement (integer micro-Jaccard) / CSR export (integer
    # offsets + sorted string arrays) / event deltas (integer epoch-micros)
    "kg_model_agreement", "kg_adjacency_csr", "rel_event_deltas",
    # dataset card / graph card / type graph: all integer + string
    "ds_dataset_card", "kg_graph_summary", "kg_type_graph",
    # entity provenance (ints + strings) / IVF recall (ints + bool) /
    # rolling distinct (dates + ints)
    "kg_entity_sources", "ds_ivf_recall_eval", "rel_rolling_distinct",
    # blocking audit (all integer) / normalization (strings + ints)
    "kg_blocking_stats", "ds_normalize_text",
    # KS drift (bp-truncated integer CDFs) / DSIR selection (grid-snapped
    # integer bucket scores summed as BIGINTs): all integer + string
    "ds_ks_drift", "ds_dsir_select",
    # ANALYZE stats / bootstrap CI / harmonic closeness: BIGINT + string
    # end to end (native min/max rendered to varchar identically)
    "rel_column_stats", "ds_bootstrap_ci", "kg_harmonic_closeness",
}


def _exact_v(v):
    if isinstance(v, (list, tuple)):
        return tuple(_exact_v(x) for x in v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    return v


def all_oracle_cases():
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize(
    "name,fn,sql", all_oracle_cases(), ids=[n for n, _, _ in all_oracle_cases()]
)
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows), f"{name}: value mismatch"

    if name in EXACT_QUERIES:
        # bit-exact tier: every value (including doubles) must match raw —
        # these outputs are integer/string-derived or exact by construction
        def _exact(cols, rows):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            return sorted(
                (tuple(_exact_v(r[i]) for i in order) for r in rows), key=repr
            )

        assert _exact(s_cols, s_rows) == _exact(d_cols, d_rows), (
            f"{name}: bit-exact mismatch"
        )


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(["subj", "pred", "obj"]) <= set(df.columns)
