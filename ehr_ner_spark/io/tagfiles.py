"""S3 / S9: CoNLL-style tag-file source and predictions text sink.

* ``read_tag_file`` — the reference's ``tag2squad`` ingestion
  (/root/reference/data_process/dataTransformer.py:25-42): line-per-token
  ``"char label"`` text, blank line ends a passage.  Read with
  ``wholetext`` so passage boundaries are deterministic regardless of file
  splits (tag fixtures are small; huge corpora arrive as parquet, S1).
* ``write_predictions`` — the ``token gold pred`` sink
  (/root/reference/utils/feaproducer.py:318-350) including its padding
  convention: positions with no prediction emit the literal
  ``"no prediction"``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKEN_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("pos", IntegerType()),
        StructField("token", StringType()),
        StructField("label", StringType()),
    ]
)


def read_tag_file(spark: SparkSession, path: str) -> DataFrame:
    """tag file -> (pid, pos, token, label) rows; pid enumerates passages."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(spark)
    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"pid": [], "pos": [], "token": [], "label": []}
            for blob in pdf["value"]:
                pid, pos = 0, 0
                saw_any = False
                for line in blob.splitlines():
                    line = line.rstrip("\n")
                    if not line.strip():
                        if saw_any and pos > 0:
                            pid += 1
                            pos = 0
                        continue
                    parts = line.split(" ")
                    token, label = parts[0], parts[-1]
                    rows["pid"].append(pid)
                    rows["pos"].append(pos)
                    rows["token"].append(token)
                    rows["label"].append(label)
                    pos += 1
                    saw_any = True
            yield pd.DataFrame(rows)

    return raw.mapInPandas(parse, TOKEN_SCHEMA)


def tokens_to_sequences(tokens: DataFrame) -> DataFrame:
    """(pid, pos, token, label) -> (pid, tokens, labels) arrays in position
    order (the List[List[(token, label)]] shape, dataTransformer.py:40-42)."""
    return (
        tokens.groupBy("pid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "token", "label"))
            ).alias("seq")
        )
        .select(
            "pid",
            F.col("seq.token").alias("tokens"),
            F.col("seq.label").alias("labels"),
        )
    )


def prediction_lines(
    gold_tokens: DataFrame, pred_tokens: DataFrame
) -> DataFrame:
    """The S9 sink's serialization as a DataFrame: ``token gold pred``
    per (pid, pos); positions with no prediction (e.g. past the model's
    max length) emit ``"no prediction"`` (feaproducer.py:335-349)."""
    return (
        gold_tokens.alias("g")
        .join(
            pred_tokens.select(
                "pid", "pos", F.col("label").alias("pred")
            ),
            ["pid", "pos"],
            "left",
        )
        .select(
            "pid", "pos",
            F.concat_ws(
                " ",
                F.col("token"),
                F.col("label"),
                F.coalesce(F.col("pred"), F.lit("no prediction")),
            ).alias("value"),
        )
    )


def write_predictions(
    gold_tokens: DataFrame, pred_tokens: DataFrame, path: str
) -> None:
    """``token gold pred`` text file via :func:`prediction_lines`."""
    (
        prediction_lines(gold_tokens, pred_tokens)
        .orderBy("pid", "pos")
        .select("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
