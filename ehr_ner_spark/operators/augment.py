"""Corpus augmentation operator: the dataAugmentator batch job
(/root/reference/data_process/dataAugmentator.py:28-98) as one Arrow-batched
stage — top-1 battery spans unioned with top-2 gotten-back spans (J3), exact
D1 dedup, D2 canonical ordering.

Output rows carry ``origin`` ('top1' | 'top2') and the reference's
``score_ratio`` confidence for top-2 recoveries."""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.augment import augment_doc
from ..kernel.scorer import DeterministicQAScorer
from ..queries_battery import QUERIES

AUG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("type", StringType()),
        StructField("start_pos", IntegerType()),
        StructField("end_pos", IntegerType()),
        StructField("text", StringType()),
        StructField("origin", StringType()),
        StructField("score_ratio", DoubleType()),
    ]
)


def augment_corpus(
    corpus_df: DataFrame,
    queries: Optional[Dict[str, str]] = None,
    p_times: float = 1.3,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    from ..pyfiles import ensure_shipped

    spark = corpus_df.sparkSession
    ensure_shipped(spark)
    queries = dict(queries or QUERIES)
    bc_q = spark.sparkContext.broadcast(queries)

    inp = corpus_df.select("doc_id", "content")
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicQAScorer()
        qs = bc_q.value
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "type", "start_pos", "end_pos", "text",
                "origin", "score_ratio")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                top1, top2 = augment_doc(scorer, qs, content, int(doc_id), p_times)
                for (_pid, typ, s, e, txt) in top1:
                    rows["doc_id"].append(int(doc_id))
                    rows["type"].append(typ)
                    rows["start_pos"].append(s)
                    rows["end_pos"].append(e)
                    rows["text"].append(txt)
                    rows["origin"].append("top1")
                    rows["score_ratio"].append(None)
                for (ratio, typ, s, e, txt) in top2:
                    rows["doc_id"].append(int(doc_id))
                    rows["type"].append(typ)
                    rows["start_pos"].append(s)
                    rows["end_pos"].append(e)
                    rows["text"].append(txt)
                    rows["origin"].append("top2")
                    rows["score_ratio"].append(float(ratio))
            yield pd.DataFrame(rows)

    out = inp.mapInPandas(run, AUG_SCHEMA)
    # D1 exact dedup on the span tuple (origin kept: top1 wins ties), D2 order
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id", "type", "start_pos", "end_pos", "text").orderBy(
        F.asc("origin")  # 'top1' < 'top2'
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
