"""Gap-based sessionization: boundary exactness, tie determinism,
and the single-shuffle plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from jvst_spark.ops.sessions import epoch_us, session_stats, sessionize
from tests.conftest import SF_DIR

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, offset_us)."""
    data = [
        (eid, uid, T0 + dt.timedelta(microseconds=off))
        for eid, uid, off in rows
    ]
    return spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp_ntz"
    )


class TestSessionize:
    def test_exact_gap_boundary_is_strict(self, spark):
        """A gap of EXACTLY gap_s stays in the same session; one
        microsecond more starts a new one. This is why the math must
        run in integer microseconds — a float-seconds epoch is ~0.5us
        coarse near current dates and can flip this boundary."""
        gap = 30 * 60 * 1_000_000
        df = _events(
            spark,
            [
                (0, 1, 0),
                (1, 1, gap),          # exactly the threshold: same session
                (2, 1, 2 * gap + 1),  # threshold + 1us: new session
            ],
        )
        out = {
            r["event_id"]: r["session_id"]
            for r in sessionize(df, gap_s=1800, tie_cols=("event_id",))
            .collect()
        }
        assert out == {0: 1, 1: 1, 2: 2}

    def test_ties_break_on_tie_cols(self, spark):
        # two events at the SAME timestamp: order must come from the
        # tie column, so session assignment is reproducible
        gap = 1800 * 1_000_000
        df = _events(spark, [(5, 1, 0), (3, 1, 0), (4, 1, gap + 1)])
        rows = sessionize(df, gap_s=1800, tie_cols=("event_id",)).collect()
        by_id = {r["event_id"]: r["session_id"] for r in rows}
        assert by_id == {3: 1, 5: 1, 4: 2}

    def test_users_are_independent(self, spark):
        gap = 1800 * 1_000_000
        df = _events(
            spark, [(0, 1, 0), (1, 2, gap + 1), (2, 1, 2 * (gap + 1))]
        )
        rows = sessionize(df, gap_s=1800, tie_cols=("event_id",)).collect()
        by_id = {r["event_id"]: (r["user_id"], r["session_id"]) for r in rows}
        # user 2's lone event is session 1 regardless of user 1's clock
        assert by_id[1] == (2, 1)
        assert by_id[0] == (1, 1) and by_id[2] == (1, 2)

    def test_session_stats_rollup(self, spark):
        gap = 1800 * 1_000_000
        df = _events(
            spark, [(0, 1, 0), (1, 1, 100), (2, 1, gap + 200)]
        )
        rows = session_stats(df, gap_s=1800, tie_cols=("event_id",)).collect()
        by_sid = {r["session_id"]: r for r in rows}
        assert by_sid[1]["n_events"] == 2
        assert by_sid[1]["start_us"] == epoch_us_of(T0)
        assert by_sid[1]["end_us"] == epoch_us_of(T0) + 100
        assert by_sid[2]["n_events"] == 1

    def test_single_exchange(self, spark):
        """Both window frames share one (partitionBy, orderBy) spec:
        the whole sessionization must plan as ONE shuffle."""
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        plan = (
            sessionize(ev, gap_s=1800, tie_cols=("event_id",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1, plan

    def test_epoch_us_matches_duckdb_semantics(self, spark):
        import duckdb

        df = spark.read.parquet(f"{SF_DIR}/events.parquet")
        got = (
            df.orderBy("event_id")
            .limit(5)
            .select(epoch_us(df, "ts").alias("us"))
            .collect()
        )
        want = duckdb.sql(
            f"SELECT epoch_us(ts) FROM '{SF_DIR}/events.parquet' "
            "ORDER BY event_id LIMIT 5"
        ).fetchall()
        assert [r["us"] for r in got] == [w[0] for w in want]


def epoch_us_of(t: dt.datetime) -> int:
    return int(
        (t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
