"""End-to-end corpus curation: the composed pipeline a user of the
reference would actually run nightly — exact dedup -> quality gate ->
deterministic split assignment -> token accounting — as ONE Spark DAG.

Each stage is an already-oracled operator (ops/dedup.py,
ops/text.py, ops/sampling.py); this module pins that they COMPOSE:
one logical plan, stage boundaries fused by Catalyst, no
materialization between stages.

Scale story (the 100 TB shape): the whole pipeline is exactly ONE
shuffle — the dedup groupBy on md5(text) (uniform keys, map-side
combine; the hot duplicate class collapses before it moves). Quality
scoring, the gate, the split coin, and token counting are all per-row
projections that ride the post-shuffle stage, so Catalyst fuses them
into the dedup reducer's output pipeline. Adding a curation stage
costs zero extra shuffles unless it aggregates.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jvst_spark.ops.dedup import exact_class_representatives
from jvst_spark.ops.sampling import assign_splits
from jvst_spark.ops.text import quality_score, tokens


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.55,
    splits: Mapping[str, float] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Run the standard curation chain and return the surviving
    training rows: (doc_id, quality, n_tokens, split).

    Stages: collapse byte-identical duplicate classes to their min-id
    representative; score quality and gate at `min_quality` (gate
    compares the ROUNDED score, so the cut is reproducible in any
    engine); draw the salted split coin; count whitespace tokens for
    budget accounting. Survivors only — at corpus scale the pipeline's
    output contract is the kept set, not a verdict per input row
    (rejected rows are `df` minus the output on doc_id when needed).
    """
    reps = exact_class_representatives(df, text_col)
    scored = quality_score(reps, text_col, extra_cols=(text_col,))
    gated = scored.filter(F.col("quality") >= F.lit(float(min_quality)))
    split = assign_splits(
        gated,
        # `is None`, not `or`: an explicitly-empty splits mapping is a
        # misconfiguration assign_splits must reject, not a request
        # for the defaults
        splits
        if splits is not None
        else {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    return split.select(
        "doc_id",
        "quality",
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        "split",
    )
