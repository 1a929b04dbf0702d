"""Input-parallelism guard shared by scan-heavy operators.

A parquet input smaller than one row group scans as a SINGLE partition, so
every pre-shuffle map stage (regex scoring, explode, hashing, Arrow UDFs)
would run on one core.  ``fan_out`` repartitions to core count when — and
only when — the scan parallelism is below it; on warehouse-scale inputs
(files >> cores) the guard is a no-op and costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(docs: DataFrame) -> DataFrame:
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par)
    return docs
