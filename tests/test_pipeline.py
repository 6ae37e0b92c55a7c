"""Composed curation pipeline (ops/pipeline.py): survivors contract,
dedup-representative selection, and the one-shuffle plan shape."""

from pyspark.sql import functions as F

from jvst_spark.ops.pipeline import curate_corpus

GOOD = (
    "the quick brown fox jumps over a lazy dog and runs on to the "
    "river in the morning for it is a fine day of sun and wind on "
    "the hill where it can rest in the shade of a tall tree for hours"
)


def test_dedup_quality_and_split(spark):
    docs = spark.createDataFrame(
        [
            (5, GOOD),
            (3, GOOD),  # byte-identical: min doc_id 3 represents
            (9, "spam spam spam spam"),  # degenerate: gated out
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in curate_corpus(docs).collect()}
    assert set(rows) == {3}
    r = rows[3]
    assert r["split"] in ("train", "val", "test")
    assert r["n_tokens"] == len(GOOD.split())
    assert 0.55 <= r["quality"] <= 1.0


def test_single_shuffle_plan(spark):
    docs = spark.createDataFrame(
        [(1, GOOD)], "doc_id bigint, text string"
    )
    plan = (
        curate_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Exchange: the dedup groupBy; every later stage is a
    # fused projection (AQE may add no reused/extra exchanges here)
    assert plan.count("Exchange") == 1, plan


def test_gate_uses_rounded_score(spark):
    # the gate compares the ROUNDED quality so engine replays agree;
    # survivors' quality column must all clear the threshold
    docs = spark.createDataFrame(
        [(i, GOOD + " extra" * (i % 5)) for i in range(20)],
        "doc_id bigint, text string",
    )
    out = curate_corpus(docs, min_quality=0.6)
    assert out.filter(F.col("quality") < 0.6).count() == 0
