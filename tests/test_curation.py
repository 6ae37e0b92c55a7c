"""Corpus-curation operators: repetition gates, PII scan, benchmark
decontamination, deterministic sampling, stratified top-k."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


class TestRepetition:
    def test_known_repetition_values(self, spark):
        from jvst_spark.ops.text import repetition_stats

        df = spark.createDataFrame(
            [
                # "a b a b a": bigrams [ab, ba, ab, ba] -> top share 2/4;
                # trigrams [aba, bab, aba] -> 1 dup of 3 -> 1 - 2/3
                (1, "a b a b a"),
                # all-same token: every bigram/trigram identical
                (2, "x x x x x x"),
                # no repetition at all
                (3, "one two three four five"),
                # short docs: no bigrams / no trigrams
                (4, "solo"),
                (5, "two words"),
                (6, ""),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert out[1]["n_bigrams"] == 4
        assert out[1]["top_bigram_share"] == 0.5
        assert out[1]["dup_trigram_frac"] == round(1 - 2 / 3, 6)
        assert out[2]["top_bigram_share"] == 1.0
        assert out[2]["dup_trigram_frac"] == 0.75
        assert out[3]["top_bigram_share"] == 0.25
        assert out[3]["dup_trigram_frac"] == 0.0
        for did in (4, 6):
            assert out[did]["n_bigrams"] == 0
            assert out[did]["top_bigram_share"] == 0.0
            assert out[did]["dup_trigram_frac"] == 0.0
        assert out[5]["n_bigrams"] == 1
        assert out[5]["top_bigram_share"] == 1.0
        assert out[5]["dup_trigram_frac"] == 0.0

    def test_no_shuffle_in_plan(self, spark, docs):
        from jvst_spark.ops.text import repetition_stats

        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPiiScan:
    def test_counts_each_pattern(self, spark):
        from jvst_spark.ops.text import pii_scan

        df = spark.createDataFrame(
            [
                (1, "mail me at jane.doe@example.com or j2@a-b.org"),
                (2, "server 192.168.0.1 and 10.0.0.255 up"),
                (3, "call +4915112345678 now"),
                (4, "nothing personal here"),
                (5, ""),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in pii_scan(df).collect()}
        assert out[1]["n_emails"] == 2 and out[1]["has_pii"]
        assert out[2]["n_ipv4"] == 2 and out[2]["has_pii"]
        assert out[3]["n_phones"] == 1 and out[3]["has_pii"]
        assert not out[4]["has_pii"] and not out[5]["has_pii"]
        assert out[4]["n_emails"] == out[4]["n_ipv4"] == out[4]["n_phones"] == 0


class TestDecontaminate:
    def test_leak_flags_and_containment_math(self, spark):
        from jvst_spark.ops.decontaminate import benchmark_ngram_overlap

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta eta")],
            ["doc_id", "text"],
        )
        corpus = spark.createDataFrame(
            [
                # full copy: every shingle matches -> frac 1.0
                (1, "alpha beta gamma delta epsilon zeta eta"),
                # embedded benchmark prefix inside a longer page
                (2, "intro words here alpha beta gamma delta epsilon tail"),
                # unrelated: zero overlap -> NOT in the output
                (3, "one two three four five six seven eight nine"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in benchmark_ngram_overlap(
                corpus, bench, k=5, threshold=0.5
            ).collect()
        }
        assert set(out) == {1, 2}
        assert out[1]["overlap_frac"] == 1.0 and out[1]["contaminated"]
        # doc 2: 5 shingles, exactly one ("alpha beta gamma delta
        # epsilon") is a benchmark shingle
        assert out[2]["n_grams"] == 5
        assert out[2]["n_matched"] == 1
        assert out[2]["overlap_frac"] == 0.2
        assert not out[2]["contaminated"]

    def test_benchmark_side_is_broadcast(self, spark, docs):
        from jvst_spark.ops.decontaminate import benchmark_ngram_overlap

        bench = docs.filter(F.col("doc_id") % 50 == 0)
        plan = (
            benchmark_ngram_overlap(docs, bench)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestSampling:
    def test_deterministic_across_parallelism(self, spark):
        from jvst_spark.ops.sampling import stratified_sample

        base = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias(
                "stratum"
            ),
        )
        rates = {"s0": 0.5, "s1": 0.25}
        kept1 = {
            r["doc_id"]
            for r in stratified_sample(
                base.coalesce(1), rates, "stratum", default_rate=0.1
            ).collect()
        }
        kept16 = {
            r["doc_id"]
            for r in stratified_sample(
                base.repartition(16), rates, "stratum", default_rate=0.1
            ).collect()
        }
        assert kept1 == kept16
        # rates actually bite per stratum (binomial bounds, wide)
        by = {"s0": 0, "s1": 0, "s2": 0}
        for did in kept1:
            by[f"s{did % 3}"] += 1
        assert 267 < by["s0"] < 400  # ~333 at 50% of 667
        assert 100 < by["s1"] < 233  # ~167 at 25%
        assert 20 < by["s2"] < 133  # ~67 at 10%

    def test_default_rate_zero_drops_unlisted(self, spark):
        from jvst_spark.ops.sampling import stratified_sample

        base = spark.createDataFrame(
            [(i, "keep" if i % 2 == 0 else "drop") for i in range(100)],
            ["doc_id", "stratum"],
        )
        out = stratified_sample(base, {"keep": 1.0}, "stratum").collect()
        assert {r["stratum"] for r in out} == {"keep"}
        assert len(out) == 50

    def test_plan_is_single_filter_no_shuffle(self, spark, docs):
        from jvst_spark.ops.sampling import stratified_sample

        plan = (
            stratified_sample(docs, {"x": 0.5}, "lang")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestAssignSplits:
    SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}

    def test_matches_reference_md5_coin(self, spark):
        import hashlib

        from jvst_spark.ops.sampling import assign_splits

        def expect(key):
            u = int(
                hashlib.md5(f"split:{key}".encode()).hexdigest()[:8], 16
            ) / 2**32
            return "train" if u < 0.9 else ("val" if u < 0.95 else "test")

        df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        got = {
            r["doc_id"]: r["split"]
            for r in assign_splits(df, self.SPLITS).collect()
        }
        assert got == {k: expect(k) for k in range(2000)}

    def test_parallelism_independent_and_proportional(self, spark):
        from jvst_spark.ops.sampling import assign_splits

        df = spark.range(0, 10000).select(F.col("id").alias("doc_id"))
        a = assign_splits(df.repartition(2), self.SPLITS)
        b = assign_splits(df.repartition(17), self.SPLITS)
        ca = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
        cb = {r["split"]: r["n"] for r in
              b.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert ca == cb
        assert sum(ca.values()) == 10000
        assert abs(ca["train"] - 9000) < 200
        assert abs(ca["val"] - 500) < 100

    def test_salt_decorrelates_from_sampling_coin(self, spark):
        from jvst_spark.ops.sampling import assign_splits, hash_uniform

        # rows KEPT by a hash sample (low unsalted coin) must still
        # split ~90/5/5 — an unsalted split would send them all to
        # 'train' (the low-coin interval)
        df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
        kept = df.where(hash_uniform(F.col("doc_id")) < 0.2)
        counts = {
            r["split"]: r["n"]
            for r in assign_splits(kept, self.SPLITS)
            .groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        total = sum(counts.values())
        assert counts.get("test", 0) > 0 and counts.get("val", 0) > 0
        assert abs(counts["train"] / total - 0.9) < 0.03


class TestPackTokenShards:
    def test_equals_global_window(self, spark):
        from pyspark.sql import Window

        from jvst_spark.ops.sampling import pack_token_shards

        # gappy, shuffled ids across several buckets
        base = spark.range(0, 900).select(
            (F.col("id") * 7 % 1000).alias("doc_id"),
            (F.col("id") % 97 + 1).alias("n_tokens"),
        ).distinct().repartition(8)
        got = {
            r["doc_id"]: r["shard_id"]
            for r in pack_token_shards(
                base, "n_tokens", budget=256, bucket_span=100
            ).collect()
        }
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        want = {
            r["doc_id"]: (r["cum"] - r["n_tokens"]) // 256
            for r in base.withColumn(
                "cum", F.sum("n_tokens").over(w)
            ).collect()
        }
        assert got == want
        # shards fill in order: ids sorted by doc_id have
        # non-decreasing shard ids starting at 0
        shard_seq = [got[k] for k in sorted(got)]
        assert shard_seq[0] == 0
        assert all(a <= b for a, b in zip(shard_seq, shard_seq[1:]))

    def test_oversized_doc_gets_own_boundary(self, spark):
        from jvst_spark.ops.sampling import pack_token_shards

        base = spark.createDataFrame(
            [(1, 10), (2, 500), (3, 10)], ["doc_id", "n_tokens"]
        )
        got = {
            r["doc_id"]: r["shard_id"]
            for r in pack_token_shards(
                base, "n_tokens", budget=100, bucket_span=10
            ).collect()
        }
        # starting offsets: 0, 10, 510 -> shards 0, 0, 5
        assert got == {1: 0, 2: 0, 3: 5}


class TestMixtureRates:
    def test_uniform_target(self, spark):
        from jvst_spark.ops.sampling import mixture_rates

        base = spark.createDataFrame(
            [(1, "a", 300), (2, "a", 300), (3, "b", 200),
             (4, "c", 100), (5, "c", 100)],
            ["doc_id", "stratum", "w"],
        )
        out = {
            r["stratum"]: r
            for r in mixture_rates(base, "stratum", "w").collect()
        }
        # grand=1000, uniform target ~333.33 per stratum
        assert out["a"]["total_weight"] == 600
        assert out["a"]["rate"] == round(1000 / 3 / 600, 6)
        assert out["b"]["rate"] == 1.0  # under-represented: pass whole
        assert out["c"]["rate"] == 1.0

    def test_explicit_target_shares(self, spark):
        from jvst_spark.ops.sampling import mixture_rates

        base = spark.createDataFrame(
            [(1, "a", 800), (2, "b", 200)], ["doc_id", "stratum", "w"]
        )
        out = {
            r["stratum"]: r["rate"]
            for r in mixture_rates(
                base, "stratum", "w", target_shares={"a": 0.5, "b": 0.5}
            ).collect()
        }
        assert out["a"] == round(500 / 800, 6)
        assert out["b"] == 1.0


class TestTopkPerStratum:
    def test_equals_naive_single_window(self, spark):
        from pyspark.sql import Window

        from jvst_spark.ops.sampling import topk_per_stratum

        base = spark.range(0, 3000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("stratum"),
            # heavy score ties to stress the tiebreak
            ((F.col("id") * 37) % 11).cast("double").alias("score"),
        )
        got = sorted(
            (r["stratum"], r["rank"], r["doc_id"])
            for r in topk_per_stratum(
                base, "stratum", "score", 10, n_salts=8
            ).collect()
        )
        w = Window.partitionBy("stratum").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        want = sorted(
            (r["stratum"], r["rank"], r["doc_id"])
            for r in base.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 10)
            .collect()
        )
        assert got == want

    def test_k_larger_than_stratum(self, spark):
        from jvst_spark.ops.sampling import topk_per_stratum

        base = spark.createDataFrame(
            [(1, "a", 0.5), (2, "a", 0.9), (3, "b", 0.1)],
            ["doc_id", "stratum", "score"],
        )
        out = topk_per_stratum(base, "stratum", "score", 10).collect()
        assert len(out) == 3
        ranks = {(r["stratum"], r["doc_id"]): r["rank"] for r in out}
        assert ranks[("a", 2)] == 1 and ranks[("a", 1)] == 2
        assert ranks[("b", 3)] == 1


class TestAssignSplitsEdges:
    def test_null_key_gets_null_split(self, spark):
        from jvst_spark.ops.sampling import assign_splits

        df = spark.createDataFrame(
            [(1,), (None,), (2,)], "doc_id long"
        )
        got = {
            r["doc_id"]: r["split"]
            for r in assign_splits(
                df, {"train": 0.9, "val": 0.05, "test": 0.05}
            ).collect()
        }
        assert got[None] is None
        assert got[1] is not None and got[2] is not None

    def test_invalid_fractions_raise(self, spark):
        import pytest

        from jvst_spark.ops.sampling import assign_splits

        df = spark.range(1).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError):
            assign_splits(df, {"a": 0.9, "b": 0.2})
        with pytest.raises(ValueError):
            assign_splits(df, {"a": -0.1, "b": 0.5})
