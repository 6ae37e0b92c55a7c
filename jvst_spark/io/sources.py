"""Sources: partitioned document tables with explicit pruning.

The north rule targets Iceberg tables; this container has no Iceberg
runtime, so the same contract is exercised against hash-bucket-
partitioned parquet (the physical mechanics — partition pruning,
filter pushdown, column pruning — are identical; swap
`format("parquet")` for `format("iceberg")` in deployment).

Partition scheme: bucket = pmod(xxhash64(doc_id), n_buckets), the same
bucketing the resume manifests use (io/manifest.py) — so a resumed run
prunes its scan to exactly the incomplete buckets.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, path: str, id_col: str = "doc_id", n_buckets: int = 16
) -> None:
    """Write partitioned by the doc-key hash bucket. At 10^12 rows the
    bucket count rises (e.g. 4096) but the layout is the same."""
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)


def read_buckets(
    spark: SparkSession, path: str, buckets: Optional[List[int]] = None
) -> DataFrame:
    """Scan with explicit partition pruning: a `bucket IN (...)` filter
    on the partition column prunes directories BEFORE listing files —
    verify with .explain() showing PartitionFilters, and
    test_sources.py asserts the pruned file count."""
    df = spark.read.parquet(path)
    if buckets is not None:
        df = df.filter(F.col("bucket").isin(buckets))
    return df


def scan_report(df: DataFrame) -> dict:
    """Introspect the physical scan: pushed filters, partition filters,
    read schema — the evidence the optimizer saw our hints."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "has_partition_filters": "PartitionFilters: [" in plan
        and "PartitionFilters: []" not in plan,
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "plan": plan,
    }
