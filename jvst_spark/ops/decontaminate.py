"""Benchmark decontamination: flag training documents whose word
k-gram shingles overlap an evaluation/benchmark set.

The standard LLM training-data hygiene step (GPT-3 appendix C /
PaLM-style n-gram collision checks): any training document sharing
too many k-grams with a benchmark document leaks the benchmark.

Scale story (the 100 TB shape):
- the benchmark side is tiny relative to the corpus (eval suites are
  thousands of documents, the corpus is billions) — its distinct
  shingle set builds in one small-side aggregation and BROADCASTS;
- the corpus is scanned ONCE; shingling is a per-row Column
  expression (no UDF), and the per-doc shingle count rides along the
  explode so totals never need a second corpus pass or a corpus-wide
  join;
- only (doc_id, gram) rows that HIT the broadcast benchmark set
  survive into the per-doc aggregation, so the one shuffle is bounded
  by the contamination volume, not the corpus size. Clean corpora
  shuffle almost nothing.

Output contract: one row per document with >= 1 matching shingle
(documents with zero overlap are by definition uncontaminated and are
not materialized — at corpus scale that is the only sane contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jvst_spark.ops.text import tokens, word_shingles


def benchmark_ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-document k-gram overlap against the benchmark shingle set.

    Returns (doc_id, n_grams, n_matched, overlap_frac, contaminated)
    for every corpus document sharing at least one distinct k-gram
    with any benchmark document. overlap_frac is measured against the
    document's own distinct-shingle count (containment, not Jaccard:
    a short benchmark prompt embedded in a long page must still
    flag the page's grams that leak, independent of page length).
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(tokens(F.col(text_col)), k)).alias(
                "gram"
            )
        )
        .distinct()
    )

    # n_grams must ride INSIDE the exploded struct: a sibling
    # projection of packed["n_grams"] beside explode(packed["grams"])
    # lands in the Project ABOVE the Generate, where it re-evaluates
    # the whole shingle build once per exploded row — O(grams^2) per
    # document (measured: 15 s -> minutes at sf0.1 depending on the
    # codegen path). With the struct emitted by the Generate itself
    # the build runs once per document and the per-element size() is
    # an O(1) length lookup on the let-bound array.
    from jvst_spark.ops._expr import let_bound

    exploded = corpus.select(
        "doc_id",
        F.explode(
            let_bound(
                word_shingles(tokens(F.col(text_col)), k),
                lambda g: F.transform(
                    g,
                    lambda x: F.struct(
                        F.size(g).alias("n_grams"), x.alias("gram")
                    ),
                ),
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.n_grams").alias("n_grams"), F.col("e.gram").alias("gram"))

    matched = (
        exploded.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("*").alias("n_matched"),
        )
    )
    frac = F.round(
        F.col("n_matched") / F.greatest(F.col("n_grams"), F.lit(1)), 6
    )
    return matched.select(
        "doc_id",
        "n_grams",
        "n_matched",
        frac.alias("overlap_frac"),
        (frac >= F.lit(float(threshold))).alias("contaminated"),
    )


def exact_snippet_overlap(
    corpus: DataFrame,
    snippets: DataFrame,
    text_col: str = "text",
    snip_col: str = "snippet",
    snip_id_col: str = "snip_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring benchmark contamination: flag corpus documents
    that contain any evaluation snippet VERBATIM (the strictest
    decontamination rule — n-gram overlap catches paraphrase-ish
    leaks, this catches the copy-paste ones with zero false
    positives).

    Scale story: eval snippet sets are tiny (thousands) against a
    billion-document corpus, so the snippet side BROADCASTS and the
    contains-join is a broadcast nested-loop over one corpus scan —
    no shuffle at all; output is bounded by contamination volume.
    For snippet sets too large for per-pair `contains` (100k+), the
    upgrade path is a multi-pattern automaton (Aho-Corasick) inside
    mapInPandas over the same broadcast — same one-scan shape.

    Returns one row per contaminated document: (doc_id, n_hits,
    first_snip) — documents with zero hits are by definition clean and
    are not materialized (same contract as benchmark_ngram_overlap).

    Empty/NULL snippets are dropped defensively: contains('') is true
    on EVERY document, so one zero-length eval row would flag the
    whole corpus and break the bounded-output contract.
    """
    snips = snippets.filter(
        F.col(snip_col).isNotNull() & (F.length(snip_col) > 0)
    )
    # alias-qualified references throughout: a snippet frame derived
    # from the same documents table legitimately carries text/doc_id
    # columns of its own (unqualified F.col would be ambiguous), and
    # the two frames often share LINEAGE (corpus rows planted from the
    # snippet set), which defeats dataframe-attribute qualification —
    # explicit string aliases survive both
    c = corpus.alias("_jvst_corpus")
    sn = snips.alias("_jvst_snips")
    hits = c.join(
        F.broadcast(sn),
        F.col(f"_jvst_corpus.{text_col}").contains(
            F.col(f"_jvst_snips.{snip_col}")
        ),
    )
    return hits.groupBy(F.col(f"_jvst_corpus.{id_col}")).agg(
        F.count("*").alias("n_hits"),
        F.min(F.col(f"_jvst_snips.{snip_id_col}")).alias("first_snip"),
    )
