"""Differential tests: funnel/retention/outliers over a seeded random
event corpus vs brute-force Python references. One Spark job per
operator; hundreds of entities exercise ties, missing steps, repeats,
and multi-day activity far beyond the hand-written cases."""

import random
from datetime import datetime

from jvst_spark.ops.events import cohort_retention, funnel_steps

STEPS = ["signup", "view", "click", "purchase"]
TYPES = STEPS + ["error"]
DAY = 86400


def _random_events(seed, n_users=120, max_ev=14):
    rng = random.Random(seed)
    rows = []
    for u in range(1, n_users + 1):
        for _ in range(rng.randrange(0, max_ev)):
            # coarse second grid makes equal-timestamp collisions
            # genuinely common (the strictly-after edge)
            s = rng.randrange(0, 5 * DAY, 1800)
            rows.append((u, s, rng.choice(TYPES)))
    return rows


def _funnel_ref(rows):
    """Stepwise-min reference: t_i = min time of steps[i] strictly
    after t_{i-1}."""
    by_user = {}
    for u, s, t in rows:
        if t in STEPS:
            by_user.setdefault(u, []).append((s, t))
    counts = []
    reach = {u: None for u in by_user}  # user -> last reached time
    alive = set(by_user)
    for step in STEPS:
        nxt = {}
        for u in alive:
            prev = reach[u]
            cand = [
                s
                for (s, t) in by_user[u]
                if t == step and (prev is None or s > prev)
            ]
            if cand:
                nxt[u] = min(cand)
        counts.append(len(nxt))
        reach = nxt
        alive = set(nxt)
    return counts


def test_funnel_matches_reference(spark):
    for seed in (7, 41):
        rows = _random_events(seed)
        ev = spark.createDataFrame(
            [(u, datetime.utcfromtimestamp(s), t) for u, s, t in rows],
            "user_id bigint, ts timestamp_ntz, event_type string",
        )
        got = {
            r["step"]: r["n_users"]
            for r in funnel_steps(ev, STEPS).collect()
        }
        ref = _funnel_ref(rows)
        assert [got[i + 1] for i in range(4)] == ref, seed


def test_retention_matches_reference(spark):
    rows = _random_events(11)
    ev = spark.createDataFrame(
        [(u, datetime.utcfromtimestamp(s), t) for u, s, t in rows],
        "user_id bigint, ts timestamp_ntz, event_type string",
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["n_active"],
            r["cohort_size"],
        )
        for r in cohort_retention(ev).collect()
    }
    days = {}
    for u, s, _ in rows:
        days.setdefault(u, set()).add(s // DAY)
    ref = {}
    sizes = {}
    for u, ds in days.items():
        c = min(ds)
        sizes[c] = sizes.get(c, 0) + 1
        for d in ds:
            k = (c, d - c)
            ref[k] = ref.get(k, 0) + 1
    assert got == {k: (v, sizes[k[0]]) for k, v in ref.items()}
