"""S2: MRC-JSON reader — the reference's machine-reading-comprehension input
format (/root/reference/utils/mrc.py:104-147 ``read_examples_from_file``).

File shape::

    {"version": ..., "query": {tag: question, ...},
     "data": [{"pid", "passage", "passage_tokens",
               "answers": [{"text", "label", "start_pos", "end_pos"}]}]}

The reference loads the whole file driver-side and loops; here the ``data``
array is exploded into a distributed DataFrame and the (passage x query)
fan-out is a broadcast join against the (tiny) query map, with the
reference's quirky answer filter preserved: an answer belongs to a query iff
the query tag is a SUBSTRING of the answer label (``ner_cate in label``,
mrc.py:140) — not equality.

The reference marks this path dead (the MRC task is commented out in
train/run_ner.py:376-446), so only the reader surface is provided; examples
feed the same featurizer family as S1.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mrc_passages(spark: SparkSession, path: str) -> DataFrame:
    """(pid, passage, passage_tokens, answers) — one row per passage.
    The top-level JSON object is one document; ``multiLine`` parses it and
    the data array is exploded (at scale: an NDJSON shard per passage list
    reads the same way without the single-object constraint)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(F.explode("data").alias("d")).select(
        F.col("d.pid").alias("pid"),
        F.col("d.passage").alias("passage"),
        F.col("d.passage_tokens").alias("passage_tokens"),
        F.col("d.answers").alias("answers"),
    )


def read_mrc_queries(spark: SparkSession, path: str) -> Dict[str, str]:
    """The file's query map (tiny; collected once, then broadcast)."""
    raw = spark.read.option("multiLine", True).json(path).select("query")
    row = raw.first()
    if row is None or row["query"] is None:
        return {}
    q = row["query"]
    return {f: getattr(q, f) for f in q.__fields__}


def mrc_examples(
    spark: SparkSession, path: str, queries: Optional[Dict[str, str]] = None
) -> DataFrame:
    """InputExample rows, one per (passage x query)
    (mrc.py:115-147): qas_id = '<pid>-<qid>', answers filtered by the
    substring rule, ``is_impossible`` = no matching answer."""
    queries = queries if queries is not None else read_mrc_queries(spark, path)
    qrows = [(i, tag, q) for i, (tag, q) in enumerate(queries.items())]
    qdf = spark.createDataFrame(
        qrows, "qid int, ner_category string, question_text string"
    )
    passages = read_mrc_passages(spark, path)
    matched = F.filter(
        "answers", lambda a: F.instr(a["label"], F.col("ner_category")) > 0
    )
    return (
        passages.crossJoin(F.broadcast(qdf))
        .withColumn("matched", matched)
        .select(
            F.concat_ws("-", F.col("pid").cast("string"),
                        F.col("qid").cast("string")).alias("qas_id"),
            "ner_category",
            "question_text",
            F.col("passage").alias("passage_text"),
            "passage_tokens",
            F.transform("matched", lambda a: a["text"]).alias("answer_text_list"),
            F.transform("matched", lambda a: a["start_pos"].cast("int")).alias("start_pos"),
            F.transform("matched", lambda a: a["end_pos"].cast("int")).alias("end_pos"),
            (F.size("matched") == 0).alias("is_impossible"),
        )
    )
