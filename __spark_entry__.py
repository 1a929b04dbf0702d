"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG mention-detection query on sf0.001.
``queries()`` / ``oracle_sql()`` enumerate implemented operators from
SURVEY.md §2 with DuckDB-checkable oracles where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ehr_ner_spark import entrypoints


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: corpus -> query-battery mention detection -> triples."""
    return entrypoints.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entrypoints.QUERIES_REGISTRY


def oracle_sql() -> dict[str, str]:
    # materialize the lazy registry into a plain dict (driver may serialize)
    return {name: entrypoints.ORACLE_REGISTRY[name]
            for name in entrypoints.ORACLE_REGISTRY}
