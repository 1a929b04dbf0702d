"""Flat-SL mention detection stage (model family #2, U2) and the SL-vs-QASL
comparison frame (the reference's 4-model side-by-side evaluation,
/root/reference/results/evaluate.py:121-197)."""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from ..kernel.sl import DeterministicSLScorer, sl_merged_labels, sl_predict
from ..kernel.wordpiece import tokenize_text
from ..queries_battery import QUERIES
from .mention_detect import MENTION_SCHEMA

TOKEN_LABEL_SCHEMA = "pid long, pos int, label string"


def detect_mentions_sl(
    corpus_df: DataFrame,
    types: Optional[Sequence[str]] = None,
    num_partitions: Optional[int] = None,
    max_seq_length: int = 512,
) -> DataFrame:
    """corpus -> flat (non-overlapping) mentions via the SL label space."""
    from ..pyfiles import ensure_shipped

    spark = corpus_df.sparkSession
    ensure_shipped(spark)
    types = list(types or QUERIES.keys())
    bc_types = spark.sparkContext.broadcast(types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicSLScorer(bc_types.value)
        for pdf in batches:
            rows: dict = {k: [] for k in (
                "doc_id", "repo", "content_sha", "type",
                "start_pos", "end_pos", "text")}
            for doc_id, repo, sha, content in zip(
                pdf["doc_id"], pdf["repo"], pdf["content_sha"], pdf["content"]
            ):
                toks = tokenize_text(content)
                for (_pid, typ, s, e, txt) in sl_predict(
                    scorer, toks, pid=int(doc_id), max_seq_length=max_seq_length
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
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")
    return inp.mapInPandas(run, MENTION_SCHEMA)


def sl_token_label_stream(
    corpus_df: DataFrame,
    types: Optional[Sequence[str]] = None,
    num_partitions: Optional[int] = None,
    max_seq_length: int = 512,
) -> DataFrame:
    """Per-token SL label stream (pid, pos, label) — the y_pred of the
    reference's token metrics (eval.py:39-47, metrics_sl.py:243-270):
    merged wordpiece labels (head keeps label), specials stripped, BEFORE
    the span decode.  Same Arrow-batched shape as detect_mentions_sl; the
    DuckDB twin is mention_sql.sl_token_labels_ctes."""
    from ..pyfiles import ensure_shipped

    spark = corpus_df.sparkSession
    ensure_shipped(spark)
    types = list(types or QUERIES.keys())
    bc_types = spark.sparkContext.broadcast(types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicSLScorer(bc_types.value)
        for pdf in batches:
            rows: dict = {"pid": [], "pos": [], "label": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                _toks, labels = sl_merged_labels(
                    scorer, tokenize_text(content), max_seq_length
                )
                for pos, lab in enumerate(labels):
                    rows["pid"].append(int(doc_id))
                    rows["pos"].append(pos)
                    rows["label"].append(lab)
            yield pd.DataFrame(rows)

    inp = corpus_df.select("doc_id", "content")
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")
    return inp.mapInPandas(run, TOKEN_LABEL_SCHEMA)


def detect_mentions_sl_crf(
    corpus_df: DataFrame,
    types: Optional[Sequence[str]] = None,
    num_partitions: Optional[int] = None,
    max_seq_length: int = 512,
) -> DataFrame:
    """Model family #4: flat SL + 65-label CRF decode
    (api/bert_sl_predictor.py:44-46 with_bilstmcrf=True; kernel/sl_crf.py).
    Same Spark plan as detect_mentions_sl — only the decode kernel differs."""
    from ..kernel.scorer import DeterministicQAScorer
    from ..kernel.sl_crf import sl_crf_predict
    from ..pyfiles import ensure_shipped

    spark = corpus_df.sparkSession
    ensure_shipped(spark)
    types = list(types or QUERIES.keys())
    bc_types = spark.sparkContext.broadcast(types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = DeterministicQAScorer()
        tps = bc_types.value
        for pdf in batches:
            rows: dict = {k: [] for k in (
                "doc_id", "repo", "content_sha", "type",
                "start_pos", "end_pos", "text")}
            for doc_id, repo, sha, content in zip(
                pdf["doc_id"], pdf["repo"], pdf["content_sha"], pdf["content"]
            ):
                toks = tokenize_text(content)
                for (_pid, typ, s, e, txt) in sl_crf_predict(
                    scorer, tps, toks, pid=int(doc_id),
                    max_seq_length=max_seq_length,
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
    if num_partitions:
        inp = inp.repartition(num_partitions, "doc_id")
    return inp.mapInPandas(run, MENTION_SCHEMA)
