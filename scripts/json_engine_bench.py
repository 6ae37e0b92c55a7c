"""Measure the two dynamic-JSON execution routes on identical inputs:

  variant — JVM variant Columns (try_parse_json / try_variant_get /
            higher-order functions). Zero Python workers, but variant
            expressions are CodegenFallback: interpreted eval.
  pyeval  — compiled-Python closures in an Arrow-batched pandas UDF
            (json.loads + closure per document).

Protocol: per query, alternate engines across 3 passes (paired
min-of-3 — this host's noise storms would otherwise land entirely on
one engine); the action is the verdict count aggregate. One warm
untimed run per (query, engine) first (variant pays a one-time
whole-expression analysis; pyeval pays UDF ship).

Usage: python scripts/json_engine_bench.py [sf_dir]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "val_json_props",
    "val_json_nested",
    "val_json_array",
    "val_json_violations",
    "val_json_deps",
    "val_json_dynprops",
    # bounded cyclic-ref spec: pyeval honors max_ref_depth with the
    # same cut semantics, so the comparison is apples-to-apples
    "val_json_recursive",
]


def main():
    from pyspark.sql import SparkSession

    import jvst_spark.queries as q

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("json-engine-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {name: q.queries()[name] for name in QUERIES}
    times = {(n, e): [] for n in QUERIES for e in ("variant", "pyeval")}

    # warm pass (untimed): plan build + codegen/UDF ship + file cache
    for name, fn in fns.items():
        for engine in ("variant", "pyeval"):
            q.JSON_ENGINE = engine
            fn(spark, sf_dir).count()

    for _ in range(3):
        for name, fn in fns.items():
            for engine in ("variant", "pyeval"):
                q.JSON_ENGINE = engine
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.collect() if len(df.columns) <= 6 else df.count()
                times[(name, engine)].append(time.perf_counter() - t0)
    q.JSON_ENGINE = "auto"

    out = {}
    for name in QUERIES:
        v = min(times[(name, "variant")])
        p = min(times[(name, "pyeval")])
        out[name] = {
            "variant_sec": round(v, 3),
            "pyeval_sec": round(p, 3),
            "pyeval_speedup": round(v / p, 2),
        }
    print(json.dumps({"sf_dir": sf_dir, "protocol":
                      "paired min-of-3 alternating, local[32]",
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
