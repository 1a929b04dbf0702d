"""W4+W5 inference-side composition: per-(doc, query) CRF path confidence.

``confidence = score(decoded path) - logZ`` — the sum-product forward
algorithm (crf_layer.py:216-262) consumed at inference, exactly the
commented-out confidence line of the reference predictor
(bert_qasl_predictor.py:68).  Training (backprop through logZ) remains a
non-goal.

Semantics (documented definition): the CRF is applied to the PASSAGE
window — the same class-weighted passage-piece emissions the battery
Viterbi scores (truncation included), with START/END at the window edges.
This makes the quantity a passage-local path likelihood and keeps the
DuckDB twin to two linear recursions (operators/crf_confidence_sql.py).

Output: (doc_id, type, n_pieces, confidence) — confidence rounded to 6
digits on both sides (exp/ln differ from NumPy by ulps; every decision
boundary in the decode itself is exact as in crf_sql.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.crf import (
    crf_log_partition,
    crf_sequence_score,
    viterbi_decode,
)
from ..kernel.scorer import CLASS_WEIGHTS, DeterministicQAScorer
from ..kernel.wordpiece import SEP, tokenize_text, wp_split, wp_split_seq
from ..queries_battery import QUERIES

CONFIDENCE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("type", StringType()),
        StructField("n_pieces", IntegerType()),
        StructField("confidence", DoubleType()),
    ]
)


def crf_confidence(
    corpus_df: DataFrame,
    queries: Optional[Dict[str, str]] = None,
    num_partitions: Optional[int] = None,
    max_seq_length: int = 512,
) -> DataFrame:
    """One row per (doc x query): confidence of the Viterbi-decoded
    passage labeling under the class-weighted CRF."""
    queries = dict(queries or QUERIES)
    spark = corpus_df.sparkSession
    from ..pyfiles import ensure_shipped

    ensure_shipped(spark)
    bc = spark.sparkContext.broadcast(
        {tag: len(wp_split_seq(tokenize_text(q))) for tag, q in queries.items()}
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicQAScorer()
        qlens = bc.value
        for pdf in batches:
            rows: dict = {k: [] for k in ("doc_id", "type", "n_pieces", "confidence")}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                p_sub = []
                for t in tokenize_text(content):
                    p_sub.extend(wp_split(t))
                for tag, qlen in qlens.items():
                    limit = max_seq_length - qlen - 3
                    pieces = p_sub[:limit]
                    if not pieces:
                        continue
                    # same emission rows as the battery Viterbi: [SEP]+P
                    # scored, row 0 dropped (prev-boost sees the [SEP])
                    em_w = (
                        scorer.logits(tag, [SEP] + pieces)[1:] * CLASS_WEIGHTS
                    )
                    path = viterbi_decode(em_w, class_weights=None)
                    conf = crf_sequence_score(em_w, path) - crf_log_partition(em_w)
                    rows["doc_id"].append(int(doc_id))
                    rows["type"].append(tag)
                    rows["n_pieces"].append(len(pieces))
                    # identical FLOOR(x*1e6 + 0.5)/1e6 expression as the
                    # DuckDB twin — Python round() is half-to-even and SQL
                    # ROUND is half-away, which disagree at exact boundaries
                    rows["confidence"].append(
                        float(np.floor(conf * 1e6 + 0.5) / 1e6)
                    )
            yield pd.DataFrame(rows)

    inp = corpus_df.select("doc_id", "content")
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")
    return inp.mapInPandas(run, CONFIDENCE_SCHEMA)
