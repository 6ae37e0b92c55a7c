"""Partition pruning + filter pushdown evidence on the bucketed layout."""

import pytest
from pyspark.sql import functions as F

from jvst_spark.io.sources import read_buckets, scan_report, write_bucketed
from jvst_spark.io.spans import spans_from_documents
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "docs")
    df = spans_from_documents(spark, SF_DIR)
    write_bucketed(df, path, n_buckets=8)
    return path


class TestPartitionPruning:
    def test_bucket_scan_prunes(self, spark, bucketed_path):
        pruned = read_buckets(spark, bucketed_path, buckets=[0, 1])
        rep = scan_report(pruned)
        assert rep["has_partition_filters"], rep["plan"][:2000]
        full = read_buckets(spark, bucketed_path).count()
        part = pruned.count()
        assert 0 < part < full

    def test_pruned_and_full_union_complete(self, spark, bucketed_path):
        all_buckets = list(range(8))
        total = read_buckets(spark, bucketed_path).count()
        per = sum(
            read_buckets(spark, bucketed_path, buckets=[b]).count()
            for b in all_buckets
        )
        assert per == total == 500

    def test_filter_pushdown_reaches_scan(self, spark, bucketed_path):
        df = read_buckets(spark, bucketed_path).filter(
            F.col("doc_id") == "doc-000000000001"
        )
        rep = scan_report(df)
        assert rep["has_pushed_filters"], rep["plan"][:2000]

    def test_column_pruning(self, spark, bucketed_path):
        df = read_buckets(spark, bucketed_path).select("doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "spans" not in plan.split("ReadSchema")[-1][:200]
