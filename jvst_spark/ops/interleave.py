"""Interleave-structure analysis over the spans table
(doc_id, spans: array<struct<kind,text,media_ref,offset>>).

A multimodal training corpus cares not just whether each document
validates but HOW text and media interleave: a doc that is 95% media
spans, or whose media clumps into one run, packs into context windows
very differently from a balanced alternation. These per-doc stats
(span counts by kind, media fraction, adjacent-kind transition count)
are the mixture/packing signals — all pure Column expressions over
the already-materialized spans array: no shuffle, no Python, linear
in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jvst_spark.ops._expr import let_bound


def interleave_stats(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """(doc_id, n_spans, n_media, media_frac, n_transitions) where
    n_transitions counts adjacent span pairs whose `kind` differs —
    2*min(runs)-ish for balanced docs, ~0 for clumped ones. Empty
    span arrays yield zeros."""
    kinds = F.transform(F.col(spans_col), lambda s: s["kind"])

    def stats_of(k: Column) -> Column:
        n = F.size(k)
        n_media = F.size(F.filter(k, lambda x: x == F.lit("media")))
        m = F.greatest(n - 1, F.lit(0))
        head = F.slice(k, 1, m)
        tail = F.slice(k, 2, m)
        n_trans = F.size(
            F.filter(
                F.zip_with(head, tail, lambda a, b: a != b), lambda x: x
            )
        )
        return F.struct(
            n.alias("n_spans"),
            n_media.alias("n_media"),
            F.round(n_media / F.greatest(n, F.lit(1)), 6).alias(
                "media_frac"
            ),
            n_trans.alias("n_transitions"),
        )

    # let-bind the kinds array: the slices, filter, and size would
    # otherwise each re-derive the transform per element
    st = let_bound(kinds, stats_of)
    return df.select("doc_id", st.alias("_s")).select(
        "doc_id",
        F.col("_s.n_spans").alias("n_spans"),
        F.col("_s.n_media").alias("n_media"),
        F.col("_s.media_frac").alias("media_frac"),
        F.col("_s.n_transitions").alias("n_transitions"),
    )
