"""Similarity search over embedding columns (array<float>).

- cosine_expr: dot/norms via zip_with + aggregate (JVM-side, no UDF)
- brute_force_topk: exact baseline — crossJoin + window row_number.
  O(n*q); correct at any q when the query set is small/broadcast.
- near_dup_pairs: all-pairs above a cosine threshold (verification
  scale only).
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets
  (deterministic md5-derived hyperplanes), candidates only within
  matching buckets across several tables, exact re-rank of candidates.
  ~O(n) instead of O(n^2); recall tunable via n_tables/n_planes.

Floats are accumulated left-to-right in DOUBLE on both engines so the
DuckDB oracle can match bit-for-bit after round(, 6).
"""

from __future__ import annotations

import math
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector: (query_id,
    neighbor_id, rank, sim). Query set is broadcast; the corpus streams
    once — one wide map + a per-query-partitioned window."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold (exact, O(n^2) —
    verification scale; the LSH path below is the 100 TB variant)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
    # explode(array(...)) Generate barrier: without it the threshold
    # filter is pushed below the projection and the cosine fold is
    # evaluated twice per pair (measured 2x wall time)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.explode(F.array(sim)).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def near_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine via blocked GEMM (Arrow mapInPandas + numpy).

    Each partition multiplies its row block against the broadcast
    normalized matrix — one matrix product per block instead of
    millions of per-pair expression folds (~40x over the Column
    version at 2k x 64). The broadcast side here is the whole corpus
    (fine to ~1M x 64 floats = 256 MB); beyond that, shard the right
    side with an IVF/LSH pre-bucket and union the block results.
    Emits (id_a < id_b, sim) above threshold.
    """
    import numpy as np

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    def block(it):
        import pandas as pd

        for pdf in it:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdf[id_col].to_numpy()
            sims = q @ b_mat.value.T  # (block, corpus)
            ii, jj = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (qids[:, None] < b_ids.value[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": qids[ii],
                    "id_b": b_ids.value[jj],
                    "sim": np.round(sims[ii, jj], 6),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        block, "id_a long, id_b long, sim double"
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> List[List[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 bytes
    (no RNG dependency; same planes every run/engine)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"lsh|{table}|{p}|{ctr}".encode()).digest()
            for i in range(0, 16, 2):
                if len(vals) >= dim:
                    break
                # two bytes -> [-1, 1)
                vals.append(((h[i] << 8 | h[i + 1]) / 32768.0) - 1.0)
            ctr += 1
        planes.append(vals)
    return planes


def lsh_bucket_expr(
    vec: Column, dim: int, n_planes: int = 12, table: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id: sign-bit string over n_planes
    fixed hyperplanes. Pure Column expression (literal plane arrays)."""
    planes = _hyperplanes(dim, n_planes, table)
    bits = []
    for pl in planes:
        lit = F.array(*[F.lit(v) for v in pl])
        bits.append(
            F.when(dot_expr(vec, lit) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return F.concat(*bits)


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_tables: int = 12,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of per-table bucket joins -> exact
    re-rank of candidates. Shuffles only (id, bucket) pairs + candidate
    rows; never materializes all-pairs."""
    from pyspark.sql import Window

    def with_buckets(df, prefix):
        rows = [
            df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}_v"),
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(F.col(vec_col), dim, n_planes, t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        return out

    qb = with_buckets(queries, "q")
    cb = with_buckets(emb, "n")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_v", "n_v")
        .distinct()
    )
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("n_id").alias("neighbor_id"),
        F.round(cosine_expr(F.col("q_v"), F.col("n_v")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
