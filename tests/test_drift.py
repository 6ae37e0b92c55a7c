"""Drift checks: PSI/KS math and stored-baseline workflow."""

import pytest
from pyspark.sql import functions as F

from jvst_spark.table_checks.drift import (
    baseline_from_df,
    drift_report,
    drift_vs_baseline,
    embedding_histogram,
    embedding_psi,
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


class TestEmbeddingDrift:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()

    def test_histogram_shape_and_mass(self, spark, emb):
        dim = len(emb.first()["embedding"])
        n_rows = emb.filter("embedding IS NOT NULL").count()
        h = embedding_histogram(emb, "embedding", 0.05)
        assert set(h.columns) == {"dim", "bin", "n"}
        per_dim = {
            r["dim"]: r["tot"]
            for r in h.groupBy("dim").agg(F.sum("n").alias("tot")).collect()
        }
        # every component of every vector lands in exactly one bin
        assert set(per_dim) == set(range(dim))
        assert all(v == n_rows for v in per_dim.values())

    def test_self_drift_is_zero_per_dim(self, spark, emb):
        res = embedding_psi(emb, emb, "embedding").collect()
        assert res and all(abs(r["psi"]) < 1e-9 for r in res)

    def test_shifted_dimension_drifts_alone(self, spark, emb):
        # shift ONLY component 0 by +0.5: dim 0 must light up, the
        # untouched dims must stay flat (the per-dimension point)
        shifted = emb.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda v, i: F.when(i == 0, v + F.lit(0.5)).otherwise(v),
            ),
        )
        res = {r["dim"]: r["psi"] for r in
               embedding_psi(shifted, emb, "embedding").collect()}
        assert res[0] > 1.0
        assert all(abs(p) < 1e-9 for d, p in res.items() if d != 0)

    def test_split_halves_vs_real_shift(self, spark, emb):
        # two random halves of the same corpus carry only sampling
        # noise; a genuinely shifted component must stand far above
        # it. Wide bins (0.25) keep the per-bin counts meaningful at
        # this fixture's 250-vectors-per-half size.
        a = emb.filter("vec_id % 2 = 0")
        b = emb.filter("vec_id % 2 = 1")
        noise = max(
            r["psi"]
            for r in embedding_psi(a, b, "embedding", 0.25).collect()
        )
        shifted = a.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda v, i: F.when(i == 0, v + F.lit(0.5)).otherwise(v),
            ),
        )
        drifted = {
            r["dim"]: r["psi"]
            for r in embedding_psi(shifted, a, "embedding", 0.25).collect()
        }
        assert drifted[0] > 5 * noise


class TestPsiTimeline:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, value double"
        )

    def test_matches_handrolled_psi(self, spark):
        import datetime as dt
        import math

        rows = []
        eid = 0
        # day 0: values clustered low; day 1: half shifted high;
        # day 2: identical to day 1 (PSI ~ 0)
        per_day = {
            0: [1.0] * 20 + [25.0] * 5,
            1: [1.0] * 10 + [25.0] * 15,
            2: [1.0] * 10 + [25.0] * 15,
        }
        for d, vals in per_day.items():
            for v in vals:
                rows.append(
                    (eid, dt.datetime(1970, 1, 1 + d, 12, 0, 0), v)
                )
                eid += 1
        from jvst_spark.table_checks.drift import EPS, psi_timeline

        got = {
            r["day_idx"]: r["psi"]
            for r in psi_timeline(
                self._mk(spark, rows), "value", "ts", bin_width=10.0
            ).collect()
        }
        assert set(got) == {1, 2}

        def psi(cur, prev):
            bins = set(cur) | set(prev)
            tc, tp = sum(cur.values()), sum(prev.values())
            s = 0.0
            for b in bins:
                p = cur.get(b, 0) / tc + EPS
                q = prev.get(b, 0) / tp + EPS
                s += (p - q) * math.log(p / q)
            return round(s, 6)

        h = lambda vals: {
            b: sum(1 for v in vals if int(v // 10) == b)
            for b in {int(v // 10) for v in vals}
        }
        assert got[1] == psi(h(per_day[1]), h(per_day[0]))
        assert got[2] == psi(h(per_day[2]), h(per_day[1]))
        assert got[2] < 1e-5 < got[1]

    def test_gap_days_have_no_row(self, spark):
        import datetime as dt

        # days 0 and 2 populated, day 1 empty: no pair has both sides
        rows = [
            (1, dt.datetime(1970, 1, 1, 6), 5.0),
            (2, dt.datetime(1970, 1, 3, 6), 5.0),
        ]
        from jvst_spark.table_checks.drift import psi_timeline

        out = psi_timeline(self._mk(spark, rows), "value", "ts").collect()
        assert out == []

    def test_single_scan_plan(self, spark):
        from jvst_spark.table_checks.drift import psi_timeline

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        plan = (
            psi_timeline(events, "value", "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan parquet") == 1
        assert "BatchEvalPython" not in plan
