"""Spark featurization stage: (documents x query battery) -> InputFeatures
table, the distributed twin of the reference's NerDataset build
(/root/reference/utils/feaproducer.py:36-105).

Where the reference memoizes features with a FileLock-guarded torch.save
cache (S6), this stage materializes to an IceTable stage (checkpointed,
bucket-resumable).  The fan-out is the broadcast battery inside the Arrow
UDF (same rationale as mention detection: the passage crosses the Python
channel once, features amplify after)."""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.features import featurize_qasl, get_labels, paint_labels_qasl
from ..kernel.wordpiece import tokenize_text
from ..queries_battery import QUERIES

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("q_tag", StringType()),
        StructField("input_ids", ArrayType(IntegerType())),
        StructField("attention_mask", ArrayType(IntegerType())),
        StructField("token_type_ids", ArrayType(IntegerType())),
        StructField("label_ids", ArrayType(IntegerType())),
    ]
)

QASL_LABELS, QASL_LABEL_MAP = get_labels(["B", "I"])  # -> O, B, I


def featurize_corpus(
    corpus_df: DataFrame,
    gold_spans: Optional[DataFrame] = None,
    queries: Optional[Dict[str, str]] = None,
    max_seq_length: int = 512,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """corpus (+ optional gold spans (pid,type,start_pos,end_pos)) ->
    one feature row per (doc x query)."""
    from ..pyfiles import ensure_shipped

    spark = corpus_df.sparkSession
    ensure_shipped(spark)
    queries = dict(queries or QUERIES)
    bc_q = spark.sparkContext.broadcast(
        [(tag, tokenize_text(q)) for tag, q in queries.items()]
    )

    inp = corpus_df.select("doc_id", "content")
    if gold_spans is not None:
        from pyspark.sql import functions as F

        spans = gold_spans.groupBy(F.col("pid").alias("doc_id")).agg(
            F.collect_list(F.struct("type", "start_pos", "end_pos")).alias("spans")
        )
        inp = inp.join(spans, "doc_id", "left")
    else:
        from pyspark.sql import functions as F

        inp = inp.withColumn(
            "spans",
            F.array().cast("array<struct<type:string,start_pos:int,end_pos:int>>"),
        )
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        battery = bc_q.value
        for pdf in batches:
            rows: Dict[str, List] = {k: [] for k in (
                "doc_id", "q_tag", "input_ids", "attention_mask",
                "token_type_ids", "label_ids")}
            for doc_id, content, spans in zip(
                pdf["doc_id"], pdf["content"], pdf["spans"]
            ):
                toks = tokenize_text(content)
                # canonical (start, end, type) paint order: collect_list is
                # partition-order-dependent, and overlapping spans make the
                # last paint win — sort so output is deterministic (D2 order)
                span_list = sorted(
                    (
                        (s["type"], int(s["start_pos"]), int(s["end_pos"]))
                        for s in (spans if spans is not None else [])
                    ),
                    key=lambda x: (x[1], x[2], x[0]),
                )
                for q_tag, q_toks in battery:
                    labels = paint_labels_qasl(len(toks), span_list, q_tag)
                    feat = featurize_qasl(
                        q_toks, toks, labels, QASL_LABEL_MAP, max_seq_length
                    )
                    rows["doc_id"].append(int(doc_id))
                    rows["q_tag"].append(q_tag)
                    for k in ("input_ids", "attention_mask", "token_type_ids", "label_ids"):
                        rows[k].append(feat[k])
            yield pd.DataFrame(rows)

    return inp.mapInPandas(run, FEATURE_SCHEMA)
