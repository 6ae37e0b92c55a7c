"""Sources: partitioned document tables with explicit pruning.

The north rule targets Iceberg tables; this container has no Iceberg
runtime, so the same contract is exercised against hash-bucket-
partitioned parquet. The swap point is a TESTED contract (round 5):
every reader/writer goes through the `table_format` parameter
(default TABLE_FORMAT = "parquet") via the generic
`format(...).save/load` DataSourceV2 surface — the one Iceberg also
implements — so deployment is `TABLE_FORMAT = "iceberg"` plus the
catalog conf (spark.sql.catalog.* + iceberg-spark-runtime on the
classpath), no code change. The physical mechanics the tests pin —
partition pruning (PartitionFilters on bucket), filter pushdown,
column pruning — are the same DataSourceV2 pushdown APIs Iceberg
serves; Iceberg additionally replaces directory listing with manifest
pruning, a strict improvement at 10^12 rows.

Partition scheme: bucket = pmod(xxhash64(doc_id), n_buckets), the same
bucketing the resume manifests use (io/manifest.py) — so a resumed run
prunes its scan to exactly the incomplete buckets. Iceberg's native
`bucket(N, doc_id)` hidden partitioning expresses the same layout
declaratively.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The Iceberg swap point: "parquet" here; "iceberg" in deployment.
TABLE_FORMAT = "parquet"


def write_bucketed(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int = 16,
    table_format: str = TABLE_FORMAT,
) -> None:
    """Write partitioned by the doc-key hash bucket. At 10^12 rows the
    bucket count rises (e.g. 4096) but the layout is the same."""
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    out.write.mode("overwrite").format(table_format).partitionBy(
        "bucket"
    ).save(path)


def read_buckets(
    spark: SparkSession,
    path: str,
    buckets: Optional[List[int]] = None,
    table_format: str = TABLE_FORMAT,
) -> DataFrame:
    """Scan with explicit partition pruning: a `bucket IN (...)` filter
    on the partition column prunes directories BEFORE listing files —
    verify with .explain() showing PartitionFilters, and
    test_sources.py asserts the pruned file count."""
    df = spark.read.format(table_format).load(path)
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
