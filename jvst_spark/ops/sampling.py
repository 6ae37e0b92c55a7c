"""Deterministic sampling and mixture curation for training-data
pipelines.

Why not rand(seed): Spark's rand() is seeded PER PARTITION — the kept
set changes with parallelism, input splits, and AQE coalescing, so a
rerun on a different cluster keeps different rows. Every sampler here
derives its coin from md5 of a stable row key instead: the same row
is kept or dropped on 8 cores, 1000 executors, or in the DuckDB
oracle, and resuming a partially-written sample is idempotent.

Scale story: hash sampling is a pure per-row filter (no shuffle, no
state); stratified top-k pre-prunes per salt group so a
low-cardinality stratum column (lang, source — a handful of values
over billions of rows) never concentrates a whole stratum on one
reducer.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from the first 32 bits of
    md5(string(key)) — engine-portable (identical digits in the DuckDB
    oracle) and independent of partitioning, unlike rand(seed)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with probability rates[stratum] (default_rate for
    unlisted strata), decided by the deterministic hash coin on
    key_col. Exact per-row reproducibility at any parallelism; the
    plan is a single Filter over the scan (no shuffle, columns prune).
    """
    rate_expr: Column = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(float(rate))
        ).otherwise(rate_expr)
    return df.where(hash_uniform(F.col(key_col)) < rate_expr)


def assign_splits(
    df: DataFrame,
    splits: Mapping[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any named-fraction)
    assignment: each row draws ONE hash coin from md5(salt || ':' ||
    key) and lands in the half-open cumulative interval of its split,
    in the given insertion order; rows at or beyond the cumulative
    total fall into the LAST split, so coverage is total even when
    fractions sum to 1 only up to float error.

    The salt decorrelates the split coin from any sampling coin drawn
    on the same key (stratified_sample keeps the LOW-coin rows — an
    unsalted split would funnel every kept row into the first split).
    Pure per-row projection: no shuffle, no state, identical
    assignment at any parallelism and in the DuckDB oracle. Adds a
    `split` column.

    NULL keys get a NULL split (not a silent landing in the last
    split — a corpus with even 1% NULL keys would otherwise bias its
    smallest split); callers decide whether to drop or route them,
    mirroring stratified_sample's NULL-drop. Fractions must be
    non-negative and sum to at most 1 (+float slack) — a silently
    unreachable split is a misconfiguration, not a remainder.
    """
    if not splits:
        raise ValueError("splits must name at least one fraction")
    fracs = [float(v) for v in splits.values()]
    if min(fracs) < 0 or sum(fracs) > 1.0 + 1e-9:
        raise ValueError(
            "split fractions must be non-negative and sum to <= 1, "
            f"got {dict(splits)}"
        )
    coin = hash_uniform(
        F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))
    )
    names = list(splits)
    expr: Column = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += float(splits[name])
        bounds.append((name, cum))
    for name, bound in reversed(bounds):
        expr = F.when(coin < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(
        "split", F.when(F.col(key_col).isNotNull(), expr)
    )


def pack_token_shards(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str = "doc_id",
    bucket_span: int = 100_000,
) -> DataFrame:
    """Assign each row to a fixed-token-budget training shard: rows in
    order_col order accumulate tokens, and a row's shard is the shard
    its STARTING offset falls in (shard_id = floor(prefix_sum /
    budget)) — the standard pack-documents-into-shards step before
    writing tokenized training files.

    The semantic answer is a GLOBAL prefix sum, which a naive
    Window.orderBy(order_col) computes by sorting the entire corpus
    into ONE partition — a non-starter at scale. This runs the classic
    two-phase distributed prefix sum instead:

      1. bucket rows by a monotone function of order_col
         (floor(order/bucket_span) — bucket order == row order), and
         cumsum WITHIN each bucket (shuffle by bucket, parallel);
      2. roll each bucket's total into per-bucket starting offsets
         (a window over n_buckets ROWS, thousands not billions) and
         broadcast-join them back: global prefix = bucket offset +
         local prefix.

    Equals the single-window answer exactly. Returns
    (order_col, tokens_col, shard_id).
    """
    bucket = F.floor(F.col(order_col) / F.lit(int(bucket_span)))
    local = df.select(
        order_col,
        tokens_col,
        bucket.alias("_b"),
        F.sum(tokens_col).over(
            Window.partitionBy(bucket).orderBy(F.col(order_col))
        ).alias("_local_cum"),
    )
    w_buckets = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_b")
        .agg(F.sum(tokens_col).alias("_btotal"))
        .select(
            "_b",
            F.coalesce(
                F.sum("_btotal").over(w_buckets), F.lit(0)
            ).alias("_offset"),
        )
    )
    cum = F.col("_offset") + F.col("_local_cum")
    return (
        local.join(F.broadcast(offsets), "_b")
        .select(
            order_col,
            tokens_col,
            F.floor((cum - F.col(tokens_col)) / F.lit(float(budget)))
            .alias("shard_id"),
        )
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    target_shares: Mapping[str, float] | None = None,
) -> DataFrame:
    """Per-stratum sampling rates that rebalance the corpus toward a
    target mixture (uniform across strata unless target_shares gives
    explicit fractions): rate = min(1, target_weight / actual_weight),
    the standard down-sample-only mixture correction (over-represented
    strata are cut, under-represented ones pass whole — rates never
    exceed 1 because this engine does not duplicate rows).

    One partial-aggregated groupBy over the corpus plus a broadcast of
    the single-row total; output is n_strata rows. Feed the rates into
    stratified_sample for the actual pass.

    Returns (stratum, n_rows, total_weight, rate).
    """
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_rows"),
        F.sum(weight_col).alias("total_weight"),
    )
    totals = per.agg(
        F.sum("total_weight").alias("_grand"),
        F.count("*").alias("_n_strata"),
    )
    if target_shares is None:
        share = F.lit(1.0) / F.col("_n_strata")
    else:
        share = F.lit(0.0)
        for stratum, frac in sorted(target_shares.items()):
            share = F.when(
                F.col("stratum") == F.lit(stratum), F.lit(float(frac))
            ).otherwise(share)
    return per.crossJoin(F.broadcast(totals)).select(
        "stratum",
        "n_rows",
        "total_weight",
        F.round(
            F.least(
                F.lit(1.0),
                (share * F.col("_grand"))
                / F.greatest(F.col("total_weight"), F.lit(1)),
            ),
            6,
        ).alias("rate"),
    )


def topk_per_stratum(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    k: int,
    tiebreak_col: str = "doc_id",
    n_salts: int = 64,
) -> DataFrame:
    """Top-k rows per stratum by score (ties broken by tiebreak_col
    ascending, so the result is a total order and exactly
    reproducible).

    Two-phase: a local top-k per (salt, stratum) — salt = hash of the
    tiebreak key mod n_salts, deterministic — bounds the final
    per-stratum window to k * n_salts candidate rows. A global top-k
    element is by construction in its salt group's local top-k, so the
    result equals the single-window answer while the heavy first pass
    spreads each stratum over n_salts reducers instead of one. With a
    handful of strata over billions of rows, the naive single window
    puts ~1/n_strata of the corpus on one task; this caps it at
    corpus/(n_strata*n_salts).

    Returns the input columns plus `rank` (1-based within stratum).
    """
    order = [F.col(score_col).desc(), F.col(tiebreak_col).asc()]
    salt = F.pmod(F.hash(F.col(tiebreak_col)), F.lit(int(n_salts)))
    local = Window.partitionBy(salt, F.col(stratum_col)).orderBy(*order)
    pruned = (
        df.withColumn("_lrk", F.row_number().over(local))
        .where(F.col("_lrk") <= k)
        .drop("_lrk")
    )
    final = Window.partitionBy(stratum_col).orderBy(*order)
    return pruned.withColumn(
        "rank", F.row_number().over(final)
    ).where(F.col("rank") <= k)
