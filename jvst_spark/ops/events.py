"""Event-table analytics: funnel conversion, cohort retention, and
freshness/completeness gap detection.

A behavioral/event corpus feeding a training pipeline needs these
before any modeling: funnels and retention are the canonical
"did the data arrive in the right shape" semantic checks, and the
freshness spine is the table-level completeness check Deequ/GE-style
suites run nightly. The reference has no analogue (jvst is
per-document — SURVEY.md §2 extension surface), so all three are pure
Spark-first designs.

Scale story (the 100 TB shape):
- `funnel_steps` is ONE shuffle keyed by the entity: per-user events
  aggregate into a time-sorted array (bounded by per-user activity,
  not corpus size) and the step cascade folds over it JVM-side with
  `F.aggregate` — no per-step self-join, no Python. A 4-step funnel
  over 10^12 events is still exactly one Exchange.
- `cohort_retention` is the same single entity-keyed shuffle: per-user
  (cohort_day, active-day set) aggregates map-side, then a tiny
  (cohort, offset) rollup. The naive formulation (events ⋈ first-seen
  per user) would re-shuffle the raw event table a second time.
- `freshness_gaps` aggregates per-day counts (tiny: one row per day),
  builds the full day spine with `sequence()` on the 1-row min/max
  aggregate, and left-joins counts back — every post-scan frame is
  O(days), so the joins broadcast and the single full scan dominates.

Skew: a bot entity with 10^8 events lands one oversized array in one
task in `funnel_steps`. Mitigation mirrors ops/dedup.py's banding
guard: `max_events_per_user` keeps only each entity's EARLIEST N
step-type events (a window row_number over the same partitioning the
groupBy needs — no extra exchange), and `log_overflow` reports how
many entities were capped. Keeping the earliest N is lossless
whenever N covers the funnel horizon (the cascade only ever consumes
first-touch times); an entity whose horizon exceeds the cap can only
LOSE later steps, never gain them.
"""

from __future__ import annotations

import logging
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

from jvst_spark.ops.sessions import day_index as day_idx  # shared
from jvst_spark.ops.sessions import epoch_us


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = None,
    log_overflow: bool = False,
) -> DataFrame:
    """Strict-order funnel: a user reaches step i when an event of
    type steps[i] occurs STRICTLY AFTER the time they reached step
    i-1 (first-touch cascade — the textbook funnel, equal to the
    stepwise `min(ts) > prev` formulation). Returns one row per step:
    (step, event_type, n_users, conv_rate) where conv_rate is the
    fraction of the previous step's users (step 1: fraction of all
    users with any step-type event considered; exactly the stepwise
    SQL's semantics).

    Single entity-keyed shuffle: events collapse to a per-user
    time-sorted (us, type) array; the cascade folds over it with
    F.aggregate, carrying the reached-time per step. No self-joins.
    """
    steps = list(steps)
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    us = epoch_us(df, ts_col)
    ev = df.filter(
        F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(type_col).isin(steps)
    ).select(
        F.col(user_col).alias("user_id"),
        F.struct(us.alias("us"), F.col(type_col).alias("t")).alias("e"),
    )
    if max_events_per_user is not None:
        if int(max_events_per_user) < 1:
            # a zero/negative cap drops every event — a silently dead
            # funnel, not a configuration anyone means
            raise ValueError(
                "max_events_per_user must be >= 1, got "
                f"{max_events_per_user}"
            )
        # earliest-N cap per entity: the window shares the groupBy's
        # partitioning, so the cap costs no extra exchange; it bounds
        # both the collected array and the fold's work per row
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("e.us"), F.col("e.t")
        )
        ranked = ev.withColumn("_rn", F.row_number().over(w))
        if log_overflow:
            # opt-in diagnostic: this is an EXTRA aggregation job at
            # call time (a count per entity, no sort) on top of the
            # lazy funnel itself — the price of a log line that must
            # fire before any action on the returned frame
            n_capped = (
                ev.groupBy("user_id")
                .count()
                .filter(F.col("count") > int(max_events_per_user))
                .count()
            )
            if n_capped:
                logger.warning(
                    "funnel_steps: %d entities exceeded "
                    "max_events_per_user=%d; later steps beyond the "
                    "horizon are dropped for them",
                    n_capped,
                    max_events_per_user,
                )
        ev = ranked.filter(
            F.col("_rn") <= int(max_events_per_user)
        ).drop("_rn")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )

    lit_steps = F.array(*[F.lit(s) for s in steps])

    def cascade(evs):
        # acc[j] = microsecond the user reached step j (null = not yet).
        # One event can only advance the single step whose predecessor
        # was reached strictly earlier — the strict `<` keeps a
        # same-timestamp event from satisfying two consecutive steps.
        init = F.array(*[F.lit(None).cast("bigint") for _ in range(k)])

        def step_fold(acc, e):
            def upd(v, j):
                prev_ok = F.when(j == 0, F.lit(True)).otherwise(
                    F.element_at(acc, j).isNotNull()
                    & (F.element_at(acc, j) < e["us"])
                )
                return F.when(v.isNotNull(), v).otherwise(
                    F.when(
                        (e["t"] == F.element_at(lit_steps, j + 1)) & prev_ok,
                        e["us"],
                    )
                )

            return F.transform(acc, upd)

        return F.aggregate(evs, init, step_fold)

    reached = per_user.select(cascade(F.col("evs")).alias("r"))
    counts = reached.agg(
        # coalesce: on an EMPTY event frame sum() is NULL but the
        # funnel's answer is 0 at every step (the SQL formulation's
        # count(*) subqueries return 0) — NULL would hide a dead funnel
        *[
            F.coalesce(
                F.sum(
                    F.element_at("r", j + 1).isNotNull().cast("long")
                ),
                F.lit(0),
            ).alias(f"n{j}")
            for j in range(k)
        ],
        F.count("*").alias("n_total"),
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j + 1).alias("step"),
                    F.lit(steps[j]).alias("event_type"),
                    F.col(f"n{j}").alias("n_users"),
                    F.round(
                        F.col(f"n{j}")
                        / F.greatest(
                            F.col("n_total") if j == 0 else F.col(f"n{j-1}"),
                            F.lit(1),
                        ),
                        6,
                    ).alias("conv_rate"),
                )
                for j in range(k)
            ]
        )
    )
    return counts.select(rows.alias("s")).select("s.*")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic day-cohort retention: cohort_day = a user's first active
    day; for each (cohort_day, day_offset >= 0) count users active on
    cohort_day + offset and the rate against the cohort size.

    One entity-keyed shuffle: per-user (cohort_day, distinct active
    days) aggregates map-side; offsets explode from the bounded
    per-user day set; the final (cohort, offset) rollup is tiny. The
    cohort-size join joins two O(days)/O(days^2) aggregate frames.
    """
    d = day_idx(df, ts_col)
    ev = df.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(F.col(user_col).alias("user_id"), d.alias("day"))
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("cohort_day"),
        F.collect_set("day").alias("days"),
    )
    active = (
        per_user.select(
            "cohort_day",
            F.explode("days").alias("day"),
        )
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    sizes = per_user.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return active.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def freshness_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    min_rows_per_day: int = 1,
) -> DataFrame:
    """Completeness spine over the observed [min_day, max_day] span:
    one row PER DAY with its row count and two verdicts — is_missing
    (zero rows arrived) and below_min (arrived but under the floor).
    The nightly "did yesterday's partition land, and was it full-size"
    check; emitting the whole spine (not only failures) makes the
    report self-auditing.

    One scan -> per-day counts (O(days) rows); the spine builds from
    sequence() on the 1-row min/max aggregate and the count join
    broadcasts. No second scan, no driver-side date loop.
    """
    d = day_idx(df, ts_col)
    ev = df.filter(F.col(ts_col).isNotNull()).select(d.alias("day"))
    counts = ev.groupBy("day").agg(F.count("*").alias("n_rows"))
    span = counts.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day_idx")
    )
    out = spine.join(
        F.broadcast(counts.withColumnRenamed("day", "day_idx")),
        "day_idx",
        "left",
    )
    n = F.coalesce(F.col("n_rows"), F.lit(0))
    return out.select(
        "day_idx",
        n.alias("n_rows"),
        (n == 0).alias("is_missing"),
        ((n > 0) & (n < F.lit(int(min_rows_per_day)))).alias("below_min"),
    )
