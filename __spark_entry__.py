"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship validation over sf0.001 (smoke check)
queries()      -> every implemented operator, (spark, sf_dir) -> DataFrame
oracle_sql()   -> DuckDB-equivalent SQL per query (correctness gate)

Implementation lives in jvst_spark/queries.py (each query's oracle SQL
is kept adjacent to its Spark code).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jvst_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the spans spec, validate the interleaved
    text+media table derived from sf0.001 documents, return verdicts +
    per-partition ids (driver checks rows>0, stable schema)."""
    return _q.val_flagship_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
