"""Explicit skew-handling utilities (north rule: "partitioning / shuffle /
skew handled explicitly").

Division of labor, stated honestly:

* **joins**: AQE skew-join splitting (enabled in session.py) — no manual
  code needed;
* **count/sum/avg groupBys**: Spark's map-side partial aggregation already
  collapses a Zipfian key to one row per mapper before the shuffle — manual
  salting there is cargo cult;
* **combine-less aggregations** (``collect_set``/``collect_list``-shaped:
  every raw row must reach the reducer) and **blocking-bucket explosion**
  (LSH head buckets): these DO need manual treatment.  The LSH case is
  handled structurally in linking.py (chain-pair fallback, PAIR_CAP); this
  module provides the salted two-phase pattern for the collect case.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame, key_cols: Sequence[str], value: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe exact distinct-set per key: phase 1 groups by
    (key, salt(value)) so the heavy key's raw rows are deduplicated across
    ``n_salts`` reducers; phase 2 merges ``n_salts`` already-distinct arrays
    per key.  Salting by hash(value) (not random) keeps each distinct value
    in exactly one salt group, so the phase-2 flatten needs no re-dedup
    across groups — and the result is deterministic.

    Output: (key..., values array<value>, n_distinct)."""
    partial = (
        df.select(*key_cols, value)
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_set(value).alias("_vals"))
    )
    return partial.groupBy(*key_cols).agg(
        F.array_sort(F.flatten(F.collect_list("_vals"))).alias("values"),
        F.size(F.array_sort(F.flatten(F.collect_list("_vals")))).alias("n_distinct"),
    )
