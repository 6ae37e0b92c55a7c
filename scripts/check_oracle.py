"""Simulate the driver's correctness gate locally: run each
__spark_entry__.queries() entry through Spark AND its oracle_sql()
through DuckDB at sf0.01; compare row count, column names, and an
order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in idx) for r in rows
    )


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:34s} rows={len(srows):7d}  (rows-only, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name:34s} ORACLE SQL ERROR: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and (
            norm_rows(scols, srows) == norm_rows(dcols, drows)
        )
        status = "✓" if (ok_cols and ok_count and ok_vals) else "✗"
        if status == "✗":
            failures.append(name)
        print(
            f"{status} {name:34s} rows={len(srows):7d} oracle={len(drows):7d} "
            f"cols={'ok' if ok_cols else f'{scols} vs {dcols}'} "
            f"vals={'ok' if ok_vals else 'MISMATCH'}"
        )
        if not ok_vals and ok_cols and ok_count:
            a = norm_rows(scols, srows)
            b = norm_rows(dcols, drows)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"    spark={x}\n    duck ={y}")
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
