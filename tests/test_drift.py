"""Drift checks: PSI/KS math and stored-baseline workflow."""

import pytest
from pyspark.sql import functions as F

from jvst_spark.table_checks.drift import (
    baseline_from_df,
    drift_report,
    drift_vs_baseline,
    histogram,
    ks_statistic,
    psi,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


class TestDriftMath:
    def test_self_drift_is_zero(self, spark, events):
        h = histogram(events, "value", 25.0)
        assert abs(psi(h, h).collect()[0]["psi"]) < 1e-9
        assert abs(ks_statistic(h, h).collect()[0]["ks"]) < 1e-9

    def test_shifted_distribution_drifts(self, spark, events):
        shifted = events.withColumn("value", F.col("value") + 200.0)
        rep = drift_report(
            shifted, "value", histogram(events, "value", 25.0), 25.0
        ).collect()[0]
        assert rep["drifted"]
        assert rep["psi"] > 0.2 and rep["ks"] > 0.15

    def test_same_distribution_no_drift(self, spark, events):
        a = events.filter("event_id % 2 = 0")
        b = events.filter("event_id % 2 = 1")
        rep = drift_report(a, "value", histogram(b, "value", 25.0), 25.0).collect()[0]
        assert not rep["drifted"]


class TestStoredBaseline:
    def test_baseline_shape_and_mass(self, spark, events):
        base = baseline_from_df(events, {"value": 25.0})
        rows = base.collect()
        assert set(base.columns) == {"column", "bin", "p"}
        assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-9

    def test_roundtrip_via_parquet(self, spark, events, tmp_path):
        path = str(tmp_path / "baseline_hist")
        baseline_from_df(events, {"value": 25.0}).write.parquet(path)
        stored = spark.read.parquet(path)
        rep = drift_vs_baseline(events, stored, {"value": 25.0}).collect()[0]
        assert not rep["drifted"]
        assert abs(rep["psi"]) < 1e-6

    def test_detects_drift_vs_stored(self, spark, events, tmp_path):
        path = str(tmp_path / "baseline_hist2")
        baseline_from_df(events, {"value": 25.0}).write.parquet(path)
        stored = spark.read.parquet(path)
        shifted = events.withColumn("value", F.col("value") * 3.0)
        rep = drift_vs_baseline(shifted, stored, {"value": 25.0}).collect()[0]
        assert rep["drifted"]
