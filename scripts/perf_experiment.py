"""Physical-strategy shootout for the flagship validation job.

Candidates:
A. current: HOF Column exprs (transform/forall) — interpreted (no codegen)
B. valid-only HOF (half the expressions)
C. explode -> per-span codegen-able checks -> map-side partial agg by
   doc_id (shuffle = 1 row/doc)
D. Arrow mapInPandas: pyarrow compute kernels over flattened span
   arrays + offset segments
"""

import sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.python.sql.dataFrameDebugging.enabled", "false")
         .config("spark.driver.memory", "48g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

path = "data/bench_spans_sf0.1.parquet"
df = spark.read.parquet(path)
df.count()  # warm

def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    sec = time.perf_counter() - t0
    print(f"{name:28s} {sec:8.2f}s  -> {out}", file=open("/tmp/perf_results.txt","a"))

# A: current full plan
from jvst_spark.compiler.plan import ValidationPlan, compile_schema
from jvst_spark.io.spans import FLAGSHIP_SPEC
plan = ValidationPlan(compile_schema(FLAGSHIP_SPEC))
t("A full apply_typed", lambda: plan.apply_typed(df).frame.agg(
    F.sum(F.col("valid").cast("long")), F.sum(F.size("_violations"))).collect())

# B: valid only
row_type = df.schema
t("B valid-only HOF", lambda: df.select(plan.valid_expr(row_type).alias("v"))
  .agg(F.sum(F.col("v").cast("long"))).collect())

# C: explode + codegen checks + agg
def c():
    ex = df.select("doc_id", F.size("spans").alias("n_spans"),
                   F.explode_outer("spans").alias("s"))
    sc = ex.select(
        "doc_id", "n_spans",
        ((F.col("s").isNull()) | (
            F.col("s.kind").isNotNull() & F.col("s.offset").isNotNull()
            & F.col("s.kind").isin("text", "media")
            & (F.col("s.offset") >= 0)
            & (F.col("s.text").isNull() | (F.length("s.text") >= 1))
            & (F.col("s.media_ref").isNull() | F.col("s.media_ref").rlike("^media-[0-9]+$"))
        )).alias("span_ok"))
    agg = sc.groupBy("doc_id").agg(
        F.min("span_ok").alias("spans_ok"), F.first("n_spans").alias("n_spans"))
    res = agg.select(
        (F.col("spans_ok") & (F.col("n_spans") >= 1)
         & F.col("doc_id").rlike("^doc-[0-9]{12}$")).alias("valid"))
    return res.agg(F.sum(F.col("valid").cast("long"))).collect()
t("C explode+agg", c)

# D: Arrow mapInPandas
import pyarrow as pa, pyarrow.compute as pc, pandas as pd, re
def d():
    def validate_batches(it):
        for pdf in it:
            docid = pa.array(pdf["doc_id"])
            ok_id = pc.match_substring_regex(docid, "^doc-[0-9]{12}$")
            spans = pdf["spans"]
            n = spans.map(lambda s: len(s) if s is not None else -1)
            # flatten span fields
            flat_kind, flat_off, flat_text, flat_ref, seg = [], [], [], [], []
            for i, s in enumerate(spans):
                if s is None: continue
                for sp in s:
                    flat_kind.append(sp["kind"]); flat_off.append(sp["offset"])
                    flat_text.append(sp["text"]); flat_ref.append(sp["media_ref"])
                    seg.append(i)
            ka = pa.array(flat_kind); oa = pa.array(flat_off, type=pa.int32())
            ta = pa.array(flat_text); ra = pa.array(flat_ref)
            ok = pc.and_(
                pc.and_(pc.is_valid(ka), pc.is_in(ka, value_set=pa.array(["text","media"]))),
                pc.and_(pc.is_valid(oa), pc.greater_equal(pc.coalesce(oa, -1), 0)))
            ok = pc.and_(ok, pc.coalesce(pc.greater_equal(pc.utf8_length(ta), 1), pa.scalar(True)))
            ok = pc.and_(ok, pc.coalesce(pc.match_substring_regex(ra, "^media-[0-9]+$"), pa.scalar(True)))
            okn = ok.to_numpy(zero_copy_only=False)
            import numpy as np
            segn = np.asarray(seg)
            doc_ok = np.ones(len(pdf), dtype=bool)
            if len(segn):
                np.logical_and.at(doc_ok, segn, okn)
            valid = ok_id.to_numpy(zero_copy_only=False) & doc_ok & (n.values >= 1)
            yield pd.DataFrame({"valid": valid})
    out = df.mapInPandas(validate_batches, "valid boolean")
    return out.agg(F.sum(F.col("valid").cast("long"))).collect()
t("D arrow mapInPandas", d)
spark.stop()
