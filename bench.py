#!/usr/bin/env python
"""Benchmark harness.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "docs_per_sec": ...,
     "scaling": {"local8_sec": ..., "local32_sec": ..., "efficiency": ...}}

The scaling block evidences the north rule's N->4N requirement in-sandbox:
the same flagship job at local[8] vs local[32] on the same input
(efficiency = (T8/T32)/4).  Disable with SPARK_GRAFT_BENCH_SCALING=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

# headline benchmark queries (name -> registry key); the flagship KG
# pipeline is timed separately since it is the throughput metric.
BENCH_QUERIES = [
    "rel_pricing_summary",
    "rel_top_customers",
    "rel_order_rank_window",
    "rel_events_tumbling",
    "kg_gold_mentions",
    "kg_priority_flat",
    "kg_metrics_micro",
    "ds_exact_dedup",
    "ds_ngram_jaccard",
    "ds_token_stats",
    "ds_quality",
    "ds_fingerprint",
    "ds_cosine_topk",
    "ds_lsh_ann",
    "ds_simhash_pairs",
]


def _session(cores: int):
    from ehr_ner_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )


def _sink(df) -> int:
    """Force full execution without driver materialization (noop sink)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def _run_flagship(spark, sf_dir: str) -> float:
    from ehr_ner_spark.corpus import corpus
    from ehr_ner_spark.operators.linking import canonical_triples, canonicalize
    from ehr_ner_spark.operators.mention_detect import detect_mentions

    t0 = time.time()
    c = corpus(spark, sf_dir)
    m = detect_mentions(c, num_partitions=4 * spark.sparkContext.defaultParallelism)
    m = m.persist()
    canon = canonicalize(m)
    _sink(canonical_triples(m, canon))
    dt = time.time() - t0
    m.unpersist()
    return dt


def main() -> None:
    from ehr_ner_spark import entrypoints

    n_docs = None
    timings: dict[str, float] = {}

    spark = _session(CPUS)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # flagship KG pipeline (throughput metric)
    flagship_sec = _run_flagship(spark, SF_DIR)
    timings["kg_pipeline"] = round(flagship_sec, 3)

    for name in BENCH_QUERIES:
        fn = entrypoints.QUERIES_REGISTRY[name]
        t0 = time.time()
        _sink(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    scaling = None
    if DO_SCALING:
        s8 = _session(8)
        t8 = _run_flagship(s8, SF_DIR)
        s8.stop()
        s32 = _session(32)
        t32 = _run_flagship(s32, SF_DIR)
        s32.stop()
        scaling = {
            "local8_sec": round(t8, 3),
            "local32_sec": round(t32, 3),
            "efficiency": round((t8 / t32) / 4.0, 3),
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_pipeline+headline_queries wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_sec, 2),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
