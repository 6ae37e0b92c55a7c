"""Check-suite runner: many table checks -> ONE (check_name, n_bad,
metric, passed) report frame.

The orchestration surface a validation engine actually ships (the
Deequ `VerificationSuite` / Great-Expectations checkpoint shape): each
nightly run executes the declared checks and lands one tiny report
row per check, which feeds alerting and the run ledger. jvst's
analogue is the process exit code over a document batch
(src/main.c:413-417) — this is that verdict, table-scoped and
itemized.

Scale story: every check reduces to a 1-row aggregate BEFORE entering
the report (counts of bounded violation sets, or an already-tiny
metric frame), so the union is O(checks) rows regardless of corpus
size. The checks share no state; Spark schedules their stages
independently inside the one action, and a failed check cannot
corrupt its neighbors' rows.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = Tuple[str, DataFrame]


def count_check(name: str, bad_rows: DataFrame) -> Check:
    """A check that passes iff its violation-row frame is empty.
    metric = the violation count (as double, for a uniform report
    column)."""
    one = bad_rows.agg(F.count("*").alias("n_bad")).select(
        "n_bad",
        F.col("n_bad").cast("double").alias("metric"),
        (F.col("n_bad") == 0).alias("passed"),
    )
    return (name, one)


def threshold_check(
    name: str, metric_df: DataFrame, metric_col: str, threshold: float
) -> Check:
    """A check over a 1-row metric frame: passes iff metric <=
    threshold. Callers hand in an already-rounded metric (the engine's
    convention) so the cut replays identically in any engine.

    The metric frame is AGGREGATED to exactly one row, so a check
    whose input vanished (the metric query returned zero rows — e.g.
    the monitored slice is empty) still lands in the report: metric
    NULL, passed FALSE. A declared check silently missing from the
    nightly report is the one failure mode alerting can never catch.
    (Multi-row frames are a caller error; max() makes the collapse
    deterministic rather than first-row-wins.)"""
    t = F.lit(float(threshold))
    one = metric_df.agg(F.max(metric_col).alias("_m")).select(
        F.coalesce((F.col("_m") > t).cast("long"), F.lit(1)).alias(
            "n_bad"
        ),
        F.col("_m").cast("double").alias("metric"),
        F.coalesce(F.col("_m") <= t, F.lit(False)).alias("passed"),
    )
    return (name, one)


def suite_report(checks: Sequence[Check]) -> DataFrame:
    """Union the per-check summary rows into the report frame
    (check_name, n_bad, metric, passed)."""
    if not checks:
        raise ValueError("a suite needs at least one check")
    out = None
    for name, df in checks:
        row = df.select(
            F.lit(name).alias("check_name"), "n_bad", "metric", "passed"
        )
        out = row if out is None else out.unionAll(row)
    return out
