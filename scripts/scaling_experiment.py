"""Controlled scaling measurement: fresh JVM per parallelism level,
N warm trials of the flagship validation job on the identical input.

Usage: python scripts/scaling_experiment.py <cores> [trials] [extraJavaOpts]
Prints: CORES=<n> TIMES=[...] BEST=<s> DOCS_PER_SEC=<n>
"""

import sys, time

sys.path.insert(0, ".")

cores = int(sys.argv[1])
trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
java_opts = sys.argv[3] if len(sys.argv) > 3 else ""

from pyspark.sql import SparkSession, functions as F

b = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .config("spark.driver.memory", "16g")
)
# pin GC parallelism to the simulated executor size — otherwise the
# JVM donates ~23 GC threads (machine-wide default) to every level,
# subsidizing small configs and distorting scaling efficiency
gc_opts = f"-XX:ParallelGCThreads={max(cores // 2, 2)} -XX:ConcGCThreads={max(cores // 4, 1)}"
b = b.config("spark.driver.extraJavaOptions", f"{gc_opts} {java_opts}".strip())
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = spark.read.parquet("data/bench_spans_sf0.1.parquet")
df.count()

from jvst_spark.compiler.plan import ValidationPlan, compile_schema
from jvst_spark.io.spans import FLAGSHIP_SPEC

plan = ValidationPlan(compile_schema(FLAGSHIP_SPEC))
times = []
n = 0
for _ in range(trials):
    t0 = time.perf_counter()
    r = plan.apply_typed(df).frame.agg(
        F.count("*"), F.sum(F.col("valid").cast("long"))
    ).collect()
    times.append(round(time.perf_counter() - t0, 2))
    n = r[0][0]
best = min(times)
print(f"CORES={cores} TIMES={times} BEST={best} DOCS_PER_SEC={round(n/best)}", flush=True)
spark.stop()
