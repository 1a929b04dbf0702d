"""End-to-end KG-construction pipeline with per-stage Iceberg-layout
checkpoints (the Spark re-expression of the reference's dataPipeline chain,
/root/reference/data_process/dataPipeline.py:13-75, with the linking +
canonicalization stages the north rule adds).

Stages (each resumable at bucket granularity; a killed run re-runs only the
buckets missing from the CURRENT manifest):

  1. mentions   — query-battery mention detection   (bucket key: doc_id)
  2. canon      — surface canonicalization map      (bucket key: text)
  3. triples    — canonical graph materialization   (bucket key: doc_id)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .corpus import corpus
from .io.icetable import IceTable
from .operators.linking import canonical_triples, canonicalize
from .operators.mention_detect import detect_mentions


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    fail_after: dict | None = None,
) -> DataFrame:
    """Run (or resume) the full pipeline; returns the triples DataFrame.

    ``fail_after``: optional {stage: k} test hook — commit only k buckets of
    that stage then raise (simulated crash).
    """
    fail_after = fail_after or {}
    t = IceTable(table_root)

    if not t.stage_complete("mentions", n_buckets):
        m = detect_mentions(corpus(spark, sf_dir), num_partitions=num_partitions)
        t.write_stage(
            m, "mentions", bucket_key="doc_id", n_buckets=n_buckets,
            fail_after_buckets=fail_after.get("mentions"),
        )
        if "mentions" in fail_after:
            raise RuntimeError("simulated crash after partial mentions commit")
    mentions = t.read_stage(spark, "mentions")

    if not t.stage_complete("canon", n_buckets):
        canon = canonicalize(mentions)
        t.write_stage(
            canon, "canon", bucket_key="text", n_buckets=n_buckets,
            fail_after_buckets=fail_after.get("canon"),
        )
        if "canon" in fail_after:
            raise RuntimeError("simulated crash after partial canon commit")
    canon_map = t.read_stage(spark, "canon")

    if not t.stage_complete("triples", n_buckets):
        trip = canonical_triples(mentions, canon_map)
        t.write_stage(
            trip, "triples", bucket_key="doc_id", n_buckets=n_buckets,
            fail_after_buckets=fail_after.get("triples"),
        )
        if "triples" in fail_after:
            raise RuntimeError("simulated crash after partial triples commit")
    return t.read_stage(spark, "triples")


def main(argv: list[str] | None = None) -> None:
    """spark-submit entrypoint (north rule launch mode)::

        spark-submit --py-files dist/ehr_ner_spark.zip \
            -m … ehr_ner_spark/pipeline.py \
            --sf-dir /root/testdata/sf0.01 --table-root /tmp/kg --buckets 16

    Re-running after a crash resumes from the last committed bucket.
    """
    import argparse

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("ehr-ner-kg-pipeline").getOrCreate()
    triples = run_pipeline(
        spark, args.sf_dir, args.table_root,
        n_buckets=args.buckets, num_partitions=args.partitions,
    )
    n = triples.count()
    print(f"PIPELINE_OK triples={n} table={args.table_root}")
    spark.stop()


if __name__ == "__main__":
    main()
