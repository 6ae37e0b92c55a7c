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

    ONE map-side-combinable exchange (round-6): each document's grams
    are sorted and run-length encoded per row (flat array ops), so a
    doc emits each DISTINCT gram once with its in-doc count. The
    rollup is then a plain count/sum groupBy — n_docs = count(*)
    because per-doc rows are distinct by construction — whose partial
    aggregation collapses grams shared across documents map-side. The
    previous countDistinct formulation needed two exchanges, and the
    first — keyed (gram, doc) — admitted no cross-document map-side
    reduction at all.
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

    def rle(s):
        # s: SORTED gram array (attribute) -> array<struct<gram,cnt>>
        # run boundaries = 1-based positions where the value changes;
        # run length = next boundary (or m+1) minus this one. The
        # m > 0 guard matters twice: sequence(1, 0) descends, and
        # element_at(s, 0) errors under ANSI.
        m = F.size(s)
        bounds = F.when(
            m > 0,
            F.filter(
                F.sequence(F.lit(1), m),
                lambda i: (i == 1)
                | (F.element_at(s, i) != F.element_at(s, i - 1)),
            ),
        ).otherwise(F.array().cast("array<int>"))
        return let_bound(
            bounds,
            lambda bs: F.zip_with(
                bs,
                F.concat(F.slice(bs, 2, F.size(bs)), F.array(m + 1)),
                lambda b, nxt: F.struct(
                    F.element_at(s, b).alias("gram"),
                    (nxt - b).cast("long").alias("cnt"),
                ),
            ),
        )

    encoded = let_bound(
        let_bound(tokens(F.col(text_col)), build),
        lambda g: let_bound(F.array_sort(g), rle),
    )
    return (
        df.select(F.explode(encoded).alias("e"))
        .select(F.col("e.gram").alias("gram"), F.col("e.cnt").alias("_c"))
        .groupBy("gram")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_c").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
    )
