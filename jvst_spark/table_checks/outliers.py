"""Row-level numeric outlier detection: z-score against per-group
population statistics.

The row-scope sibling of the verdict-sink anomaly check
(queries.val_bucket_anomaly flags hot SHARDS; this flags hot ROWS) —
the standard data-quality gate on a metric column before it feeds
training (Deequ's anomaly detection runs on aggregate metrics; a
per-row report is what an engineer actually opens).

Scale story: one map-side-combined groupBy over one scan builds the
per-group (mu, sigma) frame — O(groups) rows, broadcast back — then
the outlier filter is a per-row projection on a second scan. Output is
bounded by the outlier volume, not the corpus. The two scans are
inherent to population z-scores (the model is a corpus aggregate, same
shape as ops/text.unigram_logprob); a one-scan variant would need a
pre-agreed baseline, which `thresholds` callers can supply upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z_threshold: float = 3.0,
    id_cols: tuple = (),
) -> DataFrame:
    """Rows whose `value_col` sits more than `z_threshold` population
    standard deviations from their group's mean. The comparison uses
    the ROUNDED z (6 decimals) so the cut replays identically in any
    engine; groups with sigma = 0 flag nothing. Returns (*id_cols,
    group, value, z)."""
    stats = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.avg(value_col).alias("_mu"),
            F.stddev_pop(value_col).alias("_sigma"),
        )
    )
    j = df.join(F.broadcast(stats), group_col)
    z = F.round(
        F.when(
            F.col("_sigma") > 0,
            (F.col(value_col) - F.col("_mu")) / F.col("_sigma"),
        ),
        6,
    )
    return (
        j.select(*id_cols, group_col, value_col, z.alias("z"))
        .filter(F.abs(F.col("z")) >= F.lit(float(z_threshold)))
    )
