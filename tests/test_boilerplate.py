"""Corpus-level boilerplate removal and repeated-n-gram statistics
(ops/boilerplate.py): document-frequency semantics, order-preserving
reconstruction, and plan shape."""

import pytest
from pyspark.sql import functions as F


class TestWordChunks:
    def test_rejoin_is_lossless(self, spark):
        from jvst_spark.ops.boilerplate import word_chunks
        from jvst_spark.ops.text import tokens

        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j k"),  # 11 words -> 8 + 3
                (2, "one two"),                # shorter than n
                (3, "x " * 16),                # exactly 2 full chunks
            ],
            ["doc_id", "text"],
        )
        rows = df.select(
            "doc_id",
            F.array_join(tokens(F.col("text")), " ").alias("joined"),
            word_chunks(tokens(F.col("text")), 8).alias("chunks"),
        ).collect()
        for r in rows:
            assert " ".join(r["chunks"]) == r["joined"]
        by_id = {r["doc_id"]: r["chunks"] for r in rows}
        assert by_id[1] == ["a b c d e f g h", "i j k"]
        assert by_id[2] == ["one two"]
        assert len(by_id[3]) == 2

    def test_empty_tokens_give_empty_chunks(self, spark):
        from jvst_spark.ops.boilerplate import word_chunks
        from jvst_spark.ops.text import tokens

        df = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
        r = df.select(
            word_chunks(tokens(F.col("text")), 8).alias("chunks")
        ).collect()[0]
        assert r["chunks"] == []


class TestRemoveFrequentSegments:
    def _frame(self, spark):
        # "HDR" recurs in docs 1,2,3; "FOOT" in 1,2; doc 4 is all
        # boilerplate; doc 3 repeats HDR twice WITHIN one doc (must
        # count the doc once for frequency but remove both copies)
        return spark.createDataFrame(
            [
                (1, ["HDR", "alpha", "FOOT"]),
                (2, ["HDR", "beta", "FOOT"]),
                (3, ["HDR", "gamma", "HDR", "delta"]),
                (4, ["HDR"]),
                (5, ["unique one", "unique two"]),
            ],
            ["doc_id", "chunks"],
        )

    def test_doc_frequency_and_order(self, spark):
        from jvst_spark.ops.boilerplate import remove_frequent_segments

        out = {
            r["doc_id"]: r
            for r in remove_frequent_segments(
                self._frame(spark), "chunks", min_docs=2
            ).collect()
        }
        assert len(out) == 5
        assert out[1]["clean_text"] == "alpha"
        assert out[1]["n_segments"] == 3 and out[1]["n_removed"] == 2
        # within-doc repeat: both HDR copies removed, order preserved
        assert out[3]["clean_text"] == "gamma delta"
        assert out[3]["n_removed"] == 2
        # all-boilerplate doc survives as an empty row
        assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
        # untouched doc
        assert out[5]["clean_text"] == "unique one unique two"
        assert out[5]["n_removed"] == 0

    def test_min_docs_threshold(self, spark):
        from jvst_spark.ops.boilerplate import remove_frequent_segments

        # min_docs=3: FOOT (2 docs) survives, HDR (3 docs) is removed
        out = {
            r["doc_id"]: r["clean_text"]
            for r in remove_frequent_segments(
                self._frame(spark), "chunks", min_docs=3
            ).collect()
        }
        assert out[1] == "alpha FOOT"
        assert out[2] == "beta FOOT"

    def test_equals_naive(self, spark):
        from collections import defaultdict

        from jvst_spark.ops.boilerplate import remove_frequent_segments

        base = spark.range(0, 120).select(
            F.col("id").alias("doc_id"),
            F.transform(
                F.sequence(F.lit(0), F.col("id") % 5),
                lambda j: F.concat_ws(
                    "-", (F.col("id") + j * 7) % 13, j % 3
                ),
            ).alias("chunks"),
        )
        data = {r["doc_id"]: r["chunks"] for r in base.collect()}
        freq = defaultdict(set)
        for d, segs in data.items():
            for s in segs:
                freq[s].add(d)
        want = {}
        for d, segs in data.items():
            kept = [s for s in segs if len(freq[s]) < 4]
            want[d] = (len(segs), len(segs) - len(kept), " ".join(kept))
        got = {
            r["doc_id"]: (
                r["n_segments"], r["n_removed"], r["clean_text"]
            )
            for r in remove_frequent_segments(
                base, "chunks", min_docs=4
            ).collect()
        }
        assert got == want

    def test_plan_shape(self, spark):
        from jvst_spark.ops.boilerplate import remove_frequent_segments

        plan = (
            remove_frequent_segments(self._frame(spark), "chunks")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestCorpusFrequentNgrams:
    def test_known_counts(self, spark):
        from jvst_spark.ops.boilerplate import corpus_frequent_ngrams

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over"),
                (2, "the quick brown fox sleeps now"),
                # doc 3 contains the shared 4-gram TWICE
                (3, "x the quick brown fox y the quick brown fox z"),
                (4, "totally unrelated words here friend"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["gram"]: (r["n_docs"], r["n_occurrences"])
            for r in corpus_frequent_ngrams(
                df, "text", k=4, min_docs=2
            ).collect()
        }
        assert out["the quick brown fox"] == (3, 4)
        # single-doc grams never appear
        assert all(n_docs >= 2 for n_docs, _ in out.values())

    def test_short_docs_shingle_whole(self, spark):
        from jvst_spark.ops.boilerplate import corpus_frequent_ngrams

        df = spark.createDataFrame(
            [(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"]
        )
        out = corpus_frequent_ngrams(df, "text", k=5, min_docs=2).collect()
        assert [(r["gram"], r["n_docs"]) for r in out] == [("tiny doc", 2)]
