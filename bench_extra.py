"""Per-query isolation harness for optimization work (guide §1.4).

NOT the frozen driver bench — bench.py stays the measured contract.
This file exists so individual queries can be timed/inspected without
paying for the whole suite:

    python bench_extra.py QUERY [QUERY ...]        # min-of-3 timings
    python bench_extra.py --explain QUERY ...      # + plan to plans/r06/
    python bench_extra.py --tag after QUERY ...    # plan file suffix
    python bench_extra.py --noop QUERY ...         # noop-sink timing
                                                   # (computes EVERY column)

Timing methodology mirrors bench.py exactly (same get_spark config,
same collect-vs-count action, warm pass untimed, min-of-3) so numbers
are comparable to the driver's per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import CPUS, SF_DIR, get_spark  # noqa: E402


def run_action(df, noop: bool) -> None:
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect() if len(df.columns) <= 6 else df.count()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    noop = "--noop" in args
    tag = "before"
    if "--tag" in args:
        tag = args[args.index("--tag") + 1]
        args.remove("--tag")
        args.remove(tag)
    names = [a for a in args if not a.startswith("--")]

    import jvst_spark.queries as q

    qs = q.queries()
    if not names:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name} [warm]")
        df = fn(spark, SF_DIR)
        if explain:
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                ))
        run_action(df, noop)
        ts = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            run_action(df, noop)
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 3)
        print(f"{name:34s} {out[name]:8.3f}  (all: "
              f"{', '.join(f'{t:.3f}' for t in ts)})", flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": noop,
                      "queries": out}))


if __name__ == "__main__":
    main()
