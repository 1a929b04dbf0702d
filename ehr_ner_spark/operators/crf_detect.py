"""Battery mention detection through the CRF decode path (U3/W4/W6) — the
BertBiLSTMCRF-QASL model family of the reference:
``crf.decode(emissions = logits * class_weights)`` instead of softmax top-1
(/root/reference/api/bert_qasl_predictor.py:62-71,
models/bertbilstmcrf_qasl.py:16-92, models/crf_layer.py:264-340).

Spark plan is IDENTICAL to operators/mention_detect.py (explicit doc-hash
repartition, broadcast battery inside one Arrow iterator UDF, scorer/CRF
parameters resident per worker); only the per-passage decode kernel differs
(kernel/predict.py::predict_battery_crf — prefix-cached Viterbi).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

from ..kernel.predict import predict_battery_crf
from ..kernel.scorer import DeterministicQAScorer
from ..kernel.wordpiece import tokenize_text
from ..queries_battery import QUERIES
from .mention_detect import MENTION_SCHEMA


def detect_mentions_crf(
    corpus_df: DataFrame,
    queries: Optional[Dict[str, str]] = None,
    num_partitions: Optional[int] = None,
    max_seq_length: int = 512,
) -> DataFrame:
    """corpus (doc_id, repo, content, content_sha, ...) -> CRF-decoded
    mentions (same schema as detect_mentions)."""
    queries = dict(queries or QUERIES)
    spark = corpus_df.sparkSession
    from ..pyfiles import ensure_shipped

    ensure_shipped(spark)
    bc_queries = spark.sparkContext.broadcast(queries)

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicQAScorer()  # once per worker/partition
        battery = [(tag, tokenize_text(q)) for tag, q in bc_queries.value.items()]
        prefix_cache: dict = {}
        for pdf in batches:
            rows: dict = {k: [] for k in
                          ("doc_id", "repo", "content_sha", "type",
                           "start_pos", "end_pos", "text")}
            for doc_id, repo, sha, content in zip(
                pdf["doc_id"], pdf["repo"], pdf["content_sha"], pdf["content"]
            ):
                passage_tokens = tokenize_text(content)
                for (_pid, typ, s, e, txt) in predict_battery_crf(
                    scorer, battery, passage_tokens,
                    pid=int(doc_id), max_seq_length=max_seq_length,
                    _prefix_cache=prefix_cache,
                ):
                    rows["doc_id"].append(int(doc_id))
                    rows["repo"].append(repo)
                    rows["content_sha"].append(sha)
                    rows["type"].append(typ)
                    rows["start_pos"].append(s)
                    rows["end_pos"].append(e)
                    rows["text"].append(txt)
            yield pd.DataFrame(rows)

    inp = corpus_df.select("doc_id", "repo", "content_sha", "content")
    if num_partitions == 0:
        pass  # caller already partitioned the input
    elif num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")
    else:
        inp = inp.repartition("doc_id")
    return inp.mapInPandas(score_partition, MENTION_SCHEMA)
