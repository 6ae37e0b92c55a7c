"""Headline queries: every implemented operator as a (spark, sf_dir) ->
DataFrame callable, with its DuckDB oracle SQL kept ADJACENT so the two
cannot drift. Consumed by __spark_entry__.py (driver contract) and
bench.py.

Naming: val_*  row-level validation (SURVEY.md §2 ops 5-29)
        tbl_*  table-level checks (ops 41-43)
        dedup_*/sim_*/text_*  training-data pipeline operators
        stats_* column statistics
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jvst_spark.compiler.plan import ValidationPlan, compile_schema
from jvst_spark.io.spans import (
    FLAGSHIP_SPEC,
    FLAGSHIP_VALID_SQL,
    SPANS_SQL,
    media_catalog,
    spans_from_documents,
)
from jvst_spark.table_checks.drift import histogram, ks_statistic, psi
from jvst_spark.table_checks.referential import dangling_refs
from jvst_spark.table_checks.uniqueness import duplicate_keys

_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: Dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _flagship_plan() -> ValidationPlan:
    return ValidationPlan(compile_schema(FLAGSHIP_SPEC))


# ---------------------------------------------------------------------
# row-level validation (the flagship: ops 5-29 over the spans shape)
# ---------------------------------------------------------------------

# violations oracle: one row per failing CHECK per doc, mirroring
# decompose_checks' canonical check list for FLAGSHIP_SPEC (codes from
# src/validate_ir.h:134-163). Checks that cannot fire on typed data
# (type-mismatch arms) are omitted on both sides.
_VIOLATIONS_SQL = f"""
WITH spans_tbl AS ({SPANS_SQL})
SELECT doc_id, 9 AS code, '$.doc_id' AS path FROM spans_tbl
  WHERE NOT coalesce(regexp_matches(doc_id, '^doc-[0-9]{{12}}$'), FALSE)
UNION ALL
SELECT doc_id, 14, '$.spans' FROM spans_tbl WHERE len(spans) < 1
UNION ALL
SELECT doc_id, 6, '$.spans[*]' FROM spans_tbl
  WHERE len(list_filter(spans, s -> s.kind IS NULL OR s."offset" IS NULL)) > 0
UNION ALL
SELECT doc_id, 9, '$.spans[*].kind' FROM spans_tbl
  WHERE len(list_filter(spans, s -> s.kind IS NOT NULL
        AND NOT coalesce(s.kind IN ('text','media'), FALSE))) > 0
UNION ALL
SELECT doc_id, 11, '$.spans[*].text' FROM spans_tbl
  WHERE len(list_filter(spans, s -> s.text IS NOT NULL
        AND NOT coalesce(length(s.text) >= 1, FALSE))) > 0
UNION ALL
SELECT doc_id, 9, '$.spans[*].media_ref' FROM spans_tbl
  WHERE len(list_filter(spans, s -> s.media_ref IS NOT NULL
        AND NOT coalesce(regexp_matches(s.media_ref, '^media-[0-9]+$'), FALSE))) > 0
UNION ALL
SELECT doc_id, 3, '$.spans[*].offset' FROM spans_tbl
  WHERE len(list_filter(spans, s -> s."offset" IS NOT NULL
        AND NOT coalesce(s."offset" >= 0, FALSE))) > 0
"""


@query(
    "val_flagship_verdicts",
    f"WITH spans_tbl AS ({SPANS_SQL}) "
    f"SELECT doc_id, ({FLAGSHIP_VALID_SQL}) AS valid FROM spans_tbl",
)
def val_flagship_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc verdict over the interleaved spans table (typed path)."""
    df = spans_from_documents(spark, sf_dir)
    return _flagship_plan().apply_typed(df).verdicts().select("doc_id", "valid")


@query("val_flagship_violations", _VIOLATIONS_SQL)
def val_flagship_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded violation rows (doc_id, code, path) — jvst error codes."""
    df = spans_from_documents(spark, sf_dir)
    return (
        _flagship_plan()
        .apply_typed(df)
        .violations()
        .select("doc_id", "code", "path")
    )


@query(
    "val_flagship_metrics",
    f"""
WITH spans_tbl AS ({SPANS_SQL}),
     vio AS ({_VIOLATIONS_SQL})
SELECT (SELECT count(*) FROM spans_tbl) AS n_docs,
       (SELECT count(*) FROM spans_tbl WHERE {FLAGSHIP_VALID_SQL}) AS n_valid,
       (SELECT count(*) FROM vio) AS n_violations
""",
)
def val_flagship_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global pass/fail rollup (per-partition rollup keyed by
    spark_partition_id is engine-side; the oracle checks the totals)."""
    df = spans_from_documents(spark, sf_dir)
    res = _flagship_plan().apply_typed(df)
    return res.frame.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum(F.size("_violations").cast("long")).alias("n_violations"),
    )


# ---------------------------------------------------------------------
# table-level checks (ops 41-43)
# ---------------------------------------------------------------------


@query(
    "tbl_unique_dup_keys",
    f"""
WITH spans_tbl AS ({SPANS_SQL}),
     unioned AS (
       SELECT doc_id FROM spans_tbl
       UNION ALL
       SELECT doc_id FROM spans_tbl
         WHERE CAST(substr(doc_id, 5) AS BIGINT) % 41 = 0
     )
SELECT doc_id, count(*) AS dup_count FROM unioned
GROUP BY doc_id HAVING count(*) >= 2
""",
)
def tbl_unique_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact table-level uniqueness over doc_id. Input is the spans
    table unioned with a deterministic slice of itself (id % 41) so
    duplicates exist. groupBy shuffles the KEY only; AQE handles skew."""
    df = spans_from_documents(spark, sf_dir).select("doc_id")
    dupes = df.filter(F.substring("doc_id", 5, 12).cast("bigint") % 41 == 0)
    return duplicate_keys(df.unionAll(dupes), "doc_id")


@query(
    "tbl_ref_dangling_media",
    f"""
WITH spans_tbl AS ({SPANS_SQL}),
     refs AS (
       SELECT doc_id, s.media_ref AS media_ref
       FROM spans_tbl, UNNEST(spans) AS t(s)
       WHERE s.media_ref IS NOT NULL
     ),
     catalog AS (SELECT 'media-' || CAST(range AS VARCHAR) AS media_ref
                 FROM range(0, 6))
SELECT r.doc_id, r.media_ref FROM refs r
LEFT JOIN catalog c USING (media_ref) WHERE c.media_ref IS NULL
""",
)
def tbl_ref_dangling_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity: span media_refs absent from the media
    catalog (broadcast left-anti join; the catalog excludes 'media-6')."""
    spans = spans_from_documents(spark, sf_dir)
    refs = spans.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    return dangling_refs(
        refs, "media_ref", media_catalog(spark), "media_ref"
    ).select("doc_id", "media_ref")


_DRIFT_HIST_SQL = """
  cur AS (SELECT CAST(floor(value / 25.0) AS INT) AS bin, count(*) AS n
          FROM events WHERE event_type = 'click' AND value IS NOT NULL
          GROUP BY 1),
  base AS (SELECT CAST(floor(value / 25.0) AS INT) AS bin, count(*) AS n
           FROM events WHERE event_type = 'error' AND value IS NOT NULL
           GROUP BY 1),
  cm AS (SELECT bin, n / (SELECT SUM(n) FROM cur) AS p FROM cur),
  bm AS (SELECT bin, n / (SELECT SUM(n) FROM base) AS p FROM base),
  j AS (SELECT coalesce(cm.bin, bm.bin) AS bin,
               coalesce(cm.p, 0.0) + 1e-6 AS p,
               coalesce(bm.p, 0.0) + 1e-6 AS q
        FROM cm FULL OUTER JOIN bm ON cm.bin = bm.bin)
"""


@query(
    "tbl_drift_psi",
    f"WITH {_DRIFT_HIST_SQL} "
    "SELECT round(SUM((p - q) * ln(p / q)), 6) AS psi FROM j",
)
def tbl_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between click-value and error-value distributions (binned
    agg -> |bins| rows; the only data-sized cost is one groupBy)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cur = histogram(ev.filter("event_type = 'click'"), "value", 25.0)
    base = histogram(ev.filter("event_type = 'error'"), "value", 25.0)
    return psi(cur, base).select(F.round("psi", 6).alias("psi"))


@query(
    "tbl_drift_ks",
    f"""
WITH {_DRIFT_HIST_SQL},
  cdf AS (SELECT SUM(p) OVER (ORDER BY bin) AS cp,
                 SUM(q) OVER (ORDER BY bin) AS cq
          FROM (SELECT bin, p - 1e-6 AS p, q - 1e-6 AS q FROM j))
SELECT round(MAX(abs(cp - cq)), 6) AS ks FROM cdf
""",
)
def tbl_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS statistic between the same two distributions (cumulative sums
    over bins via a window — |bins| rows, trivially cheap)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cur = histogram(ev.filter("event_type = 'click'"), "value", 25.0)
    base = histogram(ev.filter("event_type = 'error'"), "value", 25.0)
    return ks_statistic(cur, base).select(F.round("ks", 6).alias("ks"))


# ---------------------------------------------------------------------
# column statistics (north rule: "column stats")
# ---------------------------------------------------------------------


@query(
    "stats_profile_orders",
    """
SELECT 'o_totalprice' AS column, count(o_totalprice) AS n,
       count(*) - count(o_totalprice) AS n_null,
       count(DISTINCT o_totalprice) AS n_distinct,
       round(min(o_totalprice), 6) AS min_v,
       round(max(o_totalprice), 6) AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey', count(o_custkey), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       round(min(o_custkey), 6), round(max(o_custkey), 6)
FROM orders
""",
)
def stats_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats profile (count / nulls / distinct / min / max) —
    one aggregation per column set, map-side partial aggs. At 100 TB
    swap count(DISTINCT) for approx_count_distinct (HLL++); exact here
    so the oracle can match."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def prof(c: str) -> DataFrame:
        return o.agg(
            F.lit(c).alias("column"),
            F.count(c).alias("n"),
            (F.count("*") - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.min(F.col(c).cast("double")), 6).alias("min_v"),
            F.round(F.max(F.col(c).cast("double")), 6).alias("max_v"),
        )

    return prof("o_totalprice").unionAll(prof("o_custkey"))


def queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> Dict[str, str]:
    return dict(_ORACLES)
