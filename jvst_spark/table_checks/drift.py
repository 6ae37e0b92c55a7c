"""Distribution-drift checks: PSI and KS statistic over binned aggs.

Not expressible in jvst (SURVEY.md §2 row 43). Both metrics reduce to
ONE groupBy over fixed-width bins (a single shuffle of |bins| rows, not
data rows) followed by driver-light window math:

- PSI  = sum_bins (p - q) * ln(p / q), with epsilon-smoothed masses
- KS   = max_bins |CDF_p - CDF_q|, cumulative sums via a window over
         the bin index (|bins| rows — trivially cheap)

The baseline histogram is a tiny DataFrame (broadcast join). At 100 TB
the only data-sized cost is the one binned aggregation, which Catalyst
executes with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def histogram(
    df: DataFrame, col: str, bin_width: float, lo: float = 0.0
) -> DataFrame:
    """Fixed-width binned counts: (bin int, n long). One aggregation."""
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(bin_width)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n"))
    )


def _masses(hist: DataFrame, n_col: str) -> DataFrame:
    total = Window.partitionBy()
    return hist.select(
        "bin", (F.col(n_col) / F.sum(n_col).over(total)).alias("p")
    )


def psi(current_hist: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """Population Stability Index between two histograms.
    Input: (bin, n) each. Output: single row (psi double)."""
    cur = _masses(current_hist, "n").withColumnRenamed("p", "p_cur")
    base = _masses(baseline_hist, "n").withColumnRenamed("p", "p_base")
    joined = cur.join(base, "bin", "full_outer").select(
        F.coalesce("p_cur", F.lit(0.0)).alias("p"),
        F.coalesce("p_base", F.lit(0.0)).alias("q"),
    )
    smoothed = joined.select(
        (F.col("p") + F.lit(EPS)).alias("p"), (F.col("q") + F.lit(EPS)).alias("q")
    )
    return smoothed.agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
            "psi"
        )
    )


def ks_statistic(current_hist: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """Kolmogorov-Smirnov statistic (sup |CDF diff|) between two binned
    histograms. Output: single row (ks double)."""
    cur = _masses(current_hist, "n").withColumnRenamed("p", "p_cur")
    base = _masses(baseline_hist, "n").withColumnRenamed("p", "p_base")
    joined = cur.join(base, "bin", "full_outer").select(
        "bin",
        F.coalesce("p_cur", F.lit(0.0)).alias("p"),
        F.coalesce("p_base", F.lit(0.0)).alias("q"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = joined.select(
        F.sum("p").over(w).alias("cp"), F.sum("q").over(w).alias("cq")
    )
    return cdf.agg(F.max(F.abs(F.col("cp") - F.col("cq"))).alias("ks"))


def embedding_histogram(
    df: DataFrame, vec_col: str, bin_width: float
) -> DataFrame:
    """Per-dimension binned counts over every vector component:
    (dim int, bin int, n long). posexplode multiplies rows by the
    vector width d, but the explode feeds straight into a partial
    aggregation — the shuffle carries only (dim x bins) rows, never
    the exploded data."""
    e = df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
    b = F.floor(F.col("v").cast("double") / F.lit(bin_width)).cast("int")
    return e.groupBy("dim", b.alias("bin")).agg(F.count("*").alias("n"))


def embedding_psi(
    current: DataFrame,
    baseline: DataFrame,
    vec_col: str,
    bin_width: float = 0.05,
) -> DataFrame:
    """Per-dimension PSI between two embedding slices: (dim, psi).

    The scalar drift checks watch one column; embeddings drift
    per-DIMENSION (a fine-tuned encoder shifts a few components long
    before the norm moves). Same epsilon-smoothed PSI as `psi`, keyed
    by component index. All mass math happens on exact integer bin
    counts (order-independent), so the result is deterministic at any
    parallelism — unlike a mean-vector comparison, whose float sums
    reorder under shuffle. Cost at 100 TB: two explode->partial-agg
    scans; everything after is (d x bins)-row arithmetic."""
    wd = Window.partitionBy("dim")

    def masses(df_: DataFrame, out: str) -> DataFrame:
        h = embedding_histogram(df_, vec_col, bin_width)
        return h.select(
            "dim", "bin", (F.col("n") / F.sum("n").over(wd)).alias(out)
        )

    j = (
        masses(current, "p_cur")
        .join(masses(baseline, "p_base"), ["dim", "bin"], "full_outer")
        .select(
            "dim",
            (F.coalesce("p_cur", F.lit(0.0)) + F.lit(EPS)).alias("p"),
            (F.coalesce("p_base", F.lit(0.0)) + F.lit(EPS)).alias("q"),
        )
    )
    return j.groupBy("dim").agg(
        F.sum(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
        ).alias("psi")
    )


def baseline_from_df(
    df: DataFrame, cols_widths: dict, lo: float = 0.0
) -> DataFrame:
    """Build a stored baseline histogram table in the FIXTURES.md §2
    shape: (column string, bin int, p double). Persist it once per
    reference snapshot; later runs drift-check against it without
    touching the reference data again."""
    parts = []
    for col, width in cols_widths.items():
        h = _masses(histogram(df, col, width, lo), "n").select(
            F.lit(col).alias("column"), "bin", "p"
        )
        parts.append(h)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def drift_vs_baseline(
    df: DataFrame,
    baseline: DataFrame,
    cols_widths: dict,
    lo: float = 0.0,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.15,
) -> DataFrame:
    """Per-column drift report against a stored (column, bin, p)
    baseline table: (column, psi, ks, drifted). The baseline is tiny —
    it broadcasts; the only data-sized cost is one binned aggregation
    per column."""
    reports = []
    for col, width in cols_widths.items():
        cur = histogram(df, col, width, lo)
        base = (
            baseline.filter(F.col("column") == col)
            .select("bin", F.col("p").alias("n"))  # masses work as weights
        )
        p = psi(cur, base)
        k = ks_statistic(cur, base)
        reports.append(
            p.crossJoin(k).select(
                F.lit(col).alias("column"),
                F.round("psi", 6).alias("psi"),
                F.round("ks", 6).alias("ks"),
                (
                    (F.col("psi") > F.lit(psi_threshold))
                    | (F.col("ks") > F.lit(ks_threshold))
                ).alias("drifted"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out


def drift_report(
    df: DataFrame,
    col: str,
    baseline_hist: DataFrame,
    bin_width: float,
    lo: float = 0.0,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.15,
) -> DataFrame:
    """One-row report: (column, psi, ks, drifted boolean)."""
    cur = histogram(df, col, bin_width, lo)
    p = psi(cur, baseline_hist)
    k = ks_statistic(cur, baseline_hist)
    return p.crossJoin(k).select(
        F.lit(col).alias("column"),
        "psi",
        "ks",
        (
            (F.col("psi") > F.lit(psi_threshold))
            | (F.col("ks") > F.lit(ks_threshold))
        ).alias("drifted"),
    )


def psi_timeline(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    bin_width: float = 10.0,
) -> DataFrame:
    """Per-day PSI of `value_col`'s distribution vs the PREVIOUS day —
    the drift *monitor* (is today's feed shifting?) beside the static
    pair checks above. Output: (day_idx bigint, psi double), one row
    per day that has a preceding day with data.

    Day buckets are integer days since epoch (floor(epoch_us/86.4e9))
    — timezone-free on both engines via the sessionize module's
    NTZ-safe epoch_us (parquet timestamps read as TIMESTAMP_NTZ). The
    adjacent-day pairing needs NO self-join and NO second scan: each
    event emits two rows via a 2-element explode — (its own day,
    is_cur=1) and (day+1, is_cur=0) — so ONE pass + ONE map-side-
    combined groupBy produces both sides of every day-pair; all later
    math (per-day totals window, smoothed-mass PSI fold) runs on the
    days x bins aggregate, which is tiny at any corpus size. Days
    with no previous-day data (the first day, gaps) and the phantom
    max_day+1 row drop via the tot_cur/tot_prev > 0 filter.
    """
    from jvst_spark.ops.sessions import day_index

    day = day_index(df, ts_col)
    binc = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    e2 = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    F.struct(day.alias("day_idx"), F.lit(1).alias("is_cur")),
                    F.struct(
                        (day + 1).alias("day_idx"), F.lit(0).alias("is_cur")
                    ),
                )
            ).alias("t"),
            binc.alias("bin"),
        )
        .select(F.col("t.day_idx").alias("day_idx"), "bin", "t.is_cur")
    )
    counts = e2.groupBy("day_idx", "bin").agg(
        F.sum("is_cur").alias("n_cur"),
        F.sum(1 - F.col("is_cur")).alias("n_prev"),
    )
    w = Window.partitionBy("day_idx")
    t = counts.select(
        "day_idx",
        "n_cur",
        "n_prev",
        F.sum("n_cur").over(w).alias("tot_cur"),
        F.sum("n_prev").over(w).alias("tot_prev"),
    ).where((F.col("tot_cur") > 0) & (F.col("tot_prev") > 0))
    smoothed = t.select(
        "day_idx",
        (F.col("n_cur") / F.col("tot_cur") + F.lit(EPS)).alias("p"),
        (F.col("n_prev") / F.col("tot_prev") + F.lit(EPS)).alias("q"),
    )
    return smoothed.groupBy("day_idx").agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi")
    )


def cardinality_drift(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    rel_threshold: float = 0.5,
) -> DataFrame:
    """Day-over-day distinct-entity cardinality monitor along the full
    observed day SPINE: a fully missing day lands as n_users = 0 and
    flags as a total collapse (rel_change = -1.0) instead of silently
    vanishing from the lag pairing; the day after an outage has
    prev = 0 and an undefined (NULL) rel_change, which does not flag.
    Exact distincts (two-level map-side-combined aggregate); at web
    scale swap approx_count_distinct behind the same report shape."""
    from jvst_spark.ops.sessions import day_index

    ev = df.filter(
        F.col(ts_col).isNotNull() & F.col(entity_col).isNotNull()
    )
    d = (
        ev.select(day_index(ev, ts_col).alias("day_idx"), entity_col)
        .groupBy("day_idx")
        .agg(F.countDistinct(entity_col).alias("n_users"))
    )
    span = d.agg(
        F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day_idx")
    )
    full = spine.join(F.broadcast(d), "day_idx", "left").select(
        "day_idx", F.coalesce("n_users", F.lit(0)).alias("n_users")
    )
    w = Window.orderBy("day_idx")
    prev = F.lag("n_users").over(w)
    rel = F.when(prev > 0, (F.col("n_users") - prev) / prev)
    return full.select(
        "day_idx",
        "n_users",
        prev.alias("prev"),
        F.round(rel, 6).alias("rel_change"),
        F.coalesce(
            F.abs(rel) > F.lit(float(rel_threshold)), F.lit(False)
        ).alias("flagged"),
    )
