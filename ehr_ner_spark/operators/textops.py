"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.  All hot paths are
JVM-side built-ins (regex/string/agg expressions inside whole-stage codegen);
the only Python is the n-gram language-ID scorer, which is Arrow-batched.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# BPE-ish token regex: alpha runs, single digits, single punct
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counting (pure built-ins)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score (all built-ins,
    pushdown-friendly): word count, mean word length, stopword ratio, digit
    ratio, punctuation ratio."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_digit = F.regexp_count(F.col(text_col), F.lit(r"[0-9]"))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))
    n_chars = F.length(text_col)
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(n_chars / n_words, 6).alias("mean_word_len"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
        F.round(n_digit / n_chars, 6).alias("digit_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
    )
    score = (
        F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("digit_ratio") * 10.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.15
    )
    return out.withColumn("quality", F.round(score, 6))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of whitespace-normalized
    lowercase content + a positional 8-gram rolling-window min-hash
    ("winnowing"-style), both built-ins."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    words = F.split(norm, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 8, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(words, i + 1, 8), " ")),
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_fp"),
        F.array_min(grams).alias("winnow_fp"),
    )


_LANG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang_pred", StringType()),
        StructField("lang_conf", DoubleType()),
    ]
)

_LANG_MODEL_LANGS = ("en", "de", "fr", "es", "zh")


def _char_ngram_profile(text: str, seed_lang: str) -> np.ndarray:
    """Deterministic per-language scorer: hashed char trigram profile."""
    t = text.lower()[:2000]
    if len(t) < 3:
        return np.zeros(1)
    grams = [t[i : i + 3] for i in range(len(t) - 2)]
    h = np.fromiter(
        (zlib.crc32((seed_lang + "|" + g).encode()) for g in grams),
        dtype=np.uint32, count=len(grams),
    )
    return ((h % 1000) / 1000.0)


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic (n-gram hash profiles, deterministic stand-in
    for a fastText-style classifier; Arrow-batched, model-per-worker)."""
    from ..pyfiles import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds, confs = [], []
            for t in pdf[text_col]:
                means = {
                    lang: float(_char_ngram_profile(t, lang).mean())
                    for lang in _LANG_MODEL_LANGS
                }
                best = max(sorted(means), key=lambda k: means[k])
                preds.append(best)
                confs.append(round(means[best], 6))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang_pred": preds, "lang_conf": confs}
            )

    return docs.select("doc_id", text_col).mapInPandas(score, _LANG_SCHEMA)
