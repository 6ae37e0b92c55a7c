"""Paired scaling measurement: alternate local[N] and local[4N]
contexts within ONE process so both levels share the same host fate
(JIT state, page cache, noisy-neighbor epoch). Reports min per level
and the efficiency from the paired minima.

Usage: python scripts/scaling_paired.py [N] [rounds]
"""

import sys, time

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
INPUT = "data/bench_spans_sf0.1.parquet"


def make(cores):
    from pyspark.sql import SparkSession

    gc = (f"-XX:ParallelGCThreads={max(cores // 2, 2)} "
          f"-XX:ConcGCThreads={max(cores // 4, 1)}")
    s = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", gc)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


MODE = "arrow" if "--arrow" in sys.argv else "column"


def run_once(spark):
    from pyspark.sql import functions as F

    from jvst_spark.compiler.plan import ValidationPlan, compile_schema
    from jvst_spark.io.spans import FLAGSHIP_SPEC

    df = spark.read.parquet(INPUT)
    plan = ValidationPlan(compile_schema(FLAGSHIP_SPEC))
    t0 = time.perf_counter()
    if MODE == "arrow":
        from jvst_spark.compiler.arrow_backend import arrow_verdicts

        r = arrow_verdicts(plan, df).agg(
            F.count("*"), F.sum(F.col("valid").cast("long"))
        ).collect()
    else:
        r = plan.apply_typed(df).frame.agg(
            F.count("*"), F.sum(F.col("valid").cast("long"))
        ).collect()
    return r[0][0], time.perf_counter() - t0


def main():
    times = {N: [], 4 * N: []}
    docs = 0
    for rnd in range(ROUNDS):
        for cores in (N, 4 * N):
            s = make(cores)
            if rnd == 0:
                s.read.parquet(INPUT).count()  # warm fs cache
                run_once(s)  # JIT warm
            d, sec = run_once(s)
            d, sec2 = run_once(s)
            times[cores].append(round(min(sec, sec2), 2))
            docs = d
            s.stop()
    lo, hi = min(times[N]), min(times[4 * N])
    eff = (docs / hi) / (docs / lo) / 4.0
    print(
        f"N={N} times={times[N]} 4N={4*N} times={times[4*N]} "
        f"best_N={lo} best_4N={hi} "
        f"tput_N={round(docs/lo)} tput_4N={round(docs/hi)} "
        f"efficiency={round(eff, 3)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
