"""Gap-based sessionization over an event table.

A training-data pipeline slices behavioral/event corpora into sessions
before feature extraction; the reference has no analogue (jvst is
per-document — SURVEY.md §2 extension surface), so this is pure
Spark-first design:

- ONE shuffle, keyed by the entity column. Both window frames (the
  lag probe and the running session counter) share the same
  (partitionBy, orderBy) spec, so Catalyst plans a single
  Exchange + Sort feeding one Window node chain — adding the second
  frame costs no extra shuffle or sort.
- All gap arithmetic runs on exact integer MICROSECONDS
  (unix_micros), never float epoch seconds: a microsecond timestamp
  cast to double loses ~0.5us near current epochs, which is enough to
  flip a gap comparison sitting on the threshold. Integer math makes
  the session boundary decision bit-exact at any parallelism (and
  replayable in external SQL engines).
- Determinism under ties: callers pass `tie_cols` (e.g. the event id)
  so the within-entity order is total. Without it, two events with
  equal timestamps could swap across runs and move a session boundary.

Skew: one pathological entity (a bot user with 10^8 events) sorts
inside a single task. The standard mitigation is to pre-split hot
entities on a coarse time bucket (day) before sessionizing and stitch
boundary sessions after — the same cap-and-log posture as the dedup
banding guard (ops/dedup.py). Not applied by default because it
changes semantics at the split points.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(df: DataFrame, ts_col: str):
    """Exact integer microseconds since the epoch for a timestamp
    column. Parquet timestamps read as TIMESTAMP_NTZ, which
    unix_micros rejects — and casting NTZ -> TIMESTAMP would reinterpret
    the naive value in the SESSION timezone, shifting every epoch.
    timestampdiff against an NTZ epoch literal keeps the naive value
    naive (the same semantics as DuckDB's epoch_us on a naive
    timestamp, independent of any timezone setting)."""
    dt = df.schema[ts_col].dataType.typeName()
    if dt == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    return F.unix_micros(F.col(ts_col))


DAY_US = 86_400_000_000


def day_index(df: DataFrame, ts_col: str = "ts"):
    """Integer day index since the epoch: FLOOR division of exact
    microseconds, so pre-epoch timestamps land in contiguous negative
    days (truncation toward zero would give day 0 a 48-hour span).
    The single shared derivation for every day-bucketed check
    (drift timeline, retention, freshness) — oracle SQL twins must use
    floor(epoch_us/86.4e9), not DuckDB's truncating `//`, to agree
    before 1970."""
    return F.floor(epoch_us(df, ts_col) / F.lit(DAY_US)).cast("bigint")


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign a 1-based `session_id` per entity: a new session starts
    when the gap to the previous event strictly exceeds `gap_s`
    seconds. Null timestamps/entities are the caller's to filter —
    silently dropping rows is not an operator's call."""
    order = [F.col(ts_col), *(F.col(c) for c in tie_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    us = epoch_us(df, ts_col)
    gap_us = us - F.lag(us).over(w)
    new_session = F.coalesce(
        (gap_us > F.lit(int(gap_s) * 1_000_000)).cast("long"), F.lit(0)
    )
    return df.withColumn(
        "session_id", F.sum(new_session).over(wcum) + F.lit(1)
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session rollup: (user, session_id, n_events, start_us,
    end_us). One shuffle for the window + one partial-agg groupBy on
    (user, session) — the groupBy keys are a superset of the window
    partition key, so AQE can often satisfy it without a second full
    exchange."""
    s = sessionize(df, user_col, ts_col, gap_s, tie_cols)
    us = epoch_us(df, ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
    )
