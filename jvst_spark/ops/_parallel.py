"""Minimum-parallelism guard for Python-heavy stages.

mapInPandas / applyInPandas stages inherit the input's partitioning.
A small-but-CPU-expensive input (one parquet file -> 1-2 partitions)
then runs Python work on 1-2 of N cores: the SimHash signature pass
over a 5k-doc corpus measured 3.9s on 2 partitions vs ~0.6s on 32.
At 100 TB inputs arrive with thousands of partitions, so the
repartition must be conditional — forcing it unconditionally would
add a full shuffle to every large job for nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition `df` up to `min_parts` (default: the
    cluster's defaultParallelism) ONLY when it currently has fewer
    partitions. No-op — no shuffle, no plan change — when the input is
    already wide enough, which is the normal case at scale.

    Cost note: the `.rdd` partition probe plans the input subtree on
    the driver (~0.3-0.6s on this host, once per DataFrame build —
    negligible against any real job). With AQE, probing a frame whose
    lineage already contains an Exchange can additionally execute the
    shuffle stages eagerly; call sites here probe scan/projection
    inputs, where the probe is planning-only."""
    if df.isStreaming:  # .rdd is undefined; micro-batches repartition
        return df       # via their own shuffle boundaries
    sc = df.sparkSession.sparkContext
    target = min_parts if min_parts is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
