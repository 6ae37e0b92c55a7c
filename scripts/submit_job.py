"""Production entry point: the full validation pipeline as a
spark-submit job.

    zip -r jvst_spark.zip jvst_spark
    spark-submit --py-files jvst_spark.zip \
        scripts/submit_job.py --input <spans parquet/iceberg path> \
        --spec <schema.json or compiled plan.json> --out <dir> \
        [--buckets 16] [--resume]

Reads the spans table, runs row-level validation (typed path) +
table-level checks, writes verdicts/violations/metrics, and maintains
per-bucket resume manifests. On a cluster the same script runs
unchanged; local[] is only the default master.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="spans table path")
    ap.add_argument("--spec", default=None,
                    help="schema JSON or compiled plan artifact")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--media-catalog", default=None,
                    help="dimension table for referential check")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("jvst-spark-validate")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from jvst_spark.compiler import artifact
    from jvst_spark.compiler.plan import ValidationPlan, compile_schema
    from jvst_spark.io.manifest import CheckpointedValidation
    from jvst_spark.io.spans import FLAGSHIP_SPEC

    if args.spec is None:
        spec = compile_schema(FLAGSHIP_SPEC)
    else:
        with open(args.spec) as f:
            text = f.read()
        d = json.loads(text)
        spec = artifact.loads(text) if "format" in d else compile_schema(d)

    plan = ValidationPlan(spec)
    df = spark.read.parquet(args.input)
    fingerprint = f"{args.input}|{df.count()}"

    ck = CheckpointedValidation(
        plan, args.out, n_buckets=args.buckets, id_col=args.id_col
    )
    results = ck.run(df, input_fingerprint=fingerprint)
    done = sum(1 for r in results if not r.skipped)
    skipped = sum(1 for r in results if r.skipped)

    if args.media_catalog:
        from pyspark.sql import functions as F

        from jvst_spark.table_checks.referential import ref_violation_rows

        refs = df.select(
            args.id_col, F.explode("spans").alias("s")
        ).select(args.id_col, F.col("s.media_ref").alias("media_ref"))
        dim = spark.read.parquet(args.media_catalog)
        bad = ref_violation_rows(refs, args.id_col, "media_ref", dim, "media_ref")
        bad.write.mode("overwrite").parquet(
            os.path.join(args.out, "ref_violations")
        )

    summary = {
        "buckets_computed": done,
        "buckets_skipped": skipped,
        "totals": {
            "n_docs": sum(r.n_docs for r in results),
            "n_valid": sum(r.n_valid for r in results),
            "n_violations": sum(r.n_violations for r in results),
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
