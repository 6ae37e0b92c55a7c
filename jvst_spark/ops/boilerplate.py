"""Corpus-level boilerplate removal and repeated-n-gram statistics.

The CCNet/Gopher-family curation step the per-document operators in
`ops/text.py` cannot express: a segment (line, paragraph, or fixed
word-chunk) is boilerplate when it recurs across MANY documents
(headers, footers, navigation chrome, license blocks), and removing
it requires corpus-wide document-frequency counts — a genuinely
distributed computation, unlike per-doc quality gates.

Scale story (100 TB):
- segments shuffle by md5 digest, never by raw text (bounded 32-char
  keys; collision-safe at 128 bits, the repo-wide engine-portable
  hashing standard);
- document frequency is a two-phase aggregate (distinct (digest, doc)
  then count per digest), both map-side combined;
- the frequent-segment set is tiny relative to the corpus (only
  segments crossing the min_docs threshold) — the anti-join against
  it is AQE-broadcastable; the corpus is never collected;
- reconstruction groups each document's own kept segments (one row
  per doc, array bounded by document length) — no global sort.

Reference scope note: jvst validates single documents
(/root/reference/src/validate_vm.c drives one parse per document);
corpus-frequency operators are part of this engine's LLM-pipeline
extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_chunks(toks: Column, n: int = 8) -> Column:
    """Non-overlapping n-word chunks (space-joined) of a token array —
    the segmentation to use when documents carry no newline/sentence
    structure. The final chunk may be shorter than n; rejoining all
    chunks with single spaces reproduces the token join exactly, so
    chunk removal composes losslessly with reconstruction."""
    from jvst_spark.ops._expr import let_bound

    # let-bind the token array: slicing an unbound `toks` EXPRESSION
    # inside the per-chunk lambda re-derives the tokenization once per
    # chunk — O(n^2/chunk) per document (same trap word_shingles fixes)
    def build(tk: Column) -> Column:
        size = F.size(tk)
        n_chunks = F.ceil(size / F.lit(float(n))).cast("long")
        return F.when(size > 0, F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda j: F.concat_ws(" ", F.slice(tk, j * n + 1, n)),
        )).otherwise(F.array().cast("array<string>"))

    return let_bound(toks, build)


def remove_frequent_segments(
    df: DataFrame,
    segments_col: str,
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Drop every segment that occurs in >= min_docs distinct
    documents and rebuild each document's remaining text in original
    segment order. Within-document repeats count the document once
    (document frequency, not occurrence frequency).

    Returns (id_col, n_segments, n_removed, clean_text); documents
    whose every segment is boilerplate survive with clean_text = ''.
    """
    seg = df.select(
        id_col, F.posexplode(F.col(segments_col)).alias("_pos", "_seg")
    )
    freq = (
        seg.select(F.md5(F.col("_seg")).alias("_h"), id_col)
        .distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_docs"))
        .where(F.col("_docs") >= F.lit(int(min_docs)))
        .select("_h")
    )
    # reconstruction shuffles POSITIONS, not text (round-6): the
    # anti-join emits only each document's kept (int) positions, the
    # per-doc position list aggregates on narrow rows, and clean_text
    # rebuilds by indexing the document's OWN segments array after a
    # join back — the corpus text itself never re-shuffles (the
    # previous plan collect_list'ed every kept (pos, segment-text)
    # struct through the doc_id exchange; on a boilerplate-heavy
    # corpus that is the whole corpus body).
    kept = (
        seg.withColumn("_h", F.md5(F.col("_seg")))
        .join(freq, "_h", "left_anti")
        .groupBy(id_col)
        .agg(F.collect_list("_pos").alias("_kept_pos"))
    )
    segs = F.col("_segs")
    clean = F.array_join(
        F.transform(
            F.array_sort("_kept_pos"),
            lambda p: F.element_at(segs, p + 1),
        ),
        " ",
    )
    return (
        df.select(
            id_col,
            F.col(segments_col).alias("_segs"),
            F.size(segments_col).alias("n_segments"),
        )
        .join(kept, id_col, "left")
        .select(
            id_col,
            "n_segments",
            (
                F.col("n_segments")
                - F.coalesce(F.size("_kept_pos"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.when(F.col("_kept_pos").isNotNull(), clean)
            .otherwise(F.lit(""))
            .alias("clean_text"),
        )
    )


def corpus_frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide repeated k-gram table: every k-word shingle that
    appears in >= min_docs distinct documents, with its document
    frequency and total occurrence count (within-doc repeats counted).
    The curation diagnostic behind boilerplate thresholds and
    memorization audits.

    One explode + one map-side-combined groupBy on the gram string;
    output is only the repeated tail, never the full gram inventory.
    """
    from jvst_spark.ops._expr import let_bound
    from jvst_spark.ops.text import tokens

    # let-bound token array (see word_chunks): the per-gram slice must
    # read an attribute, not re-run the tokenization per gram
    def build(tk):
        n = F.size(tk)
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, k)),
        )

    grams = let_bound(tokens(F.col(text_col)), build)
    return (
        df.select(F.col(id_col).alias("_doc"), F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.countDistinct("_doc").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
    )
