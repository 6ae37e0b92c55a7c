"""Stateful streaming dedup: drop already-seen doc_ids across
micro-batches with applyInPandasWithState.

The streaming analogue of the table uniqueness check. Round-5 scale
redesign: state is keyed BY doc_id — one long counter per key — so
the state store holds exactly one tiny entry per distinct document
id. That is the shape Spark's state backends are built for (the
RocksDB state store handles billions of keys with incremental
checkpointing; `spark.sql.streaming.stateStore.providerClass` selects
it in deployment). The previous design grouped by a hash bucket and
serialized the bucket's ENTIRE seen-set into one state blob — at
10^12 documents each of the 64 blobs would be gigabytes, an OOM by
construction; it survives as `streaming_duplicates_blob` strictly as
the regression fixture proving output equivalence.

Late re-arrivals of a key are emitted to the duplicates stream
(n_seen = occurrences so far); first arrivals emit nothing, so the
clean stream is the complement. For unbounded streams pair with an
upstream watermark/reprocess window; state per key never grows (one
counter), so retention is about key CARDINALITY only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_seen", LongType(), False),
    ]
)
_COUNT_STATE = StructType([StructField("n", LongType(), True)])


def streaming_duplicates(
    stream_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Emit (doc_id, n_seen) whenever a doc_id arrives that was already
    seen in any earlier micro-batch (n_seen = occurrences so far incl.
    current). First arrivals emit nothing.

    State: one long per doc_id (groupBy(doc_id) -> count state). The
    per-batch shuffle is on doc_id — the same key a batch uniqueness
    check would shuffle on — and the state store scales by key count,
    not by value size."""

    def update(key, pdfs, state: GroupState):
        (doc,) = key
        n = state.get[0] if state.exists else 0
        out_counts = []
        for pdf in pdfs:
            for _ in range(len(pdf)):
                n += 1
                if n >= 2:
                    out_counts.append(n)
        state.update((n,))
        # first arrivals — the dominant case in a dedup workload —
        # yield NOTHING: constructing + Arrow-shipping an empty
        # DataFrame per key would tax exactly the hot path
        if out_counts:
            import pandas as pd

            yield pd.DataFrame(
                {"doc_id": [doc] * len(out_counts), "n_seen": out_counts}
            )

    grouped = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id")
    ).groupBy("doc_id")
    return grouped.applyInPandasWithState(
        update, _OUT, _COUNT_STATE, "append", GroupStateTimeout.NoTimeout
    )


_BLOB_STATE = StructType([StructField("seen", StringType(), True)])


def streaming_duplicates_blob(
    stream_df: DataFrame, id_col: str = "doc_id", n_groups: int = 64
) -> DataFrame:
    """The round-4 hash-group design (seen-set serialized into one
    state blob per group). Kept ONLY as the differential fixture for
    streaming_duplicates — its per-group state grows with the group's
    key cardinality, which does not scale. Do not deploy."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen: dict = {}
        if state.exists:
            (blob,) = state.get
            if blob:
                for part in blob.split("\x1f"):
                    k, _, c = part.rpartition("\x1e")
                    seen[k] = int(c)
        out_ids, out_counts = [], []
        for pdf in pdfs:
            for doc in pdf[id_col]:
                c = seen.get(doc, 0) + 1
                seen[doc] = c
                if c >= 2:
                    out_ids.append(doc)
                    out_counts.append(c)
        state.update(
            ("\x1f".join(f"{k}\x1e{c}" for k, c in seen.items()),)
        )
        yield pd.DataFrame({"doc_id": out_ids, "n_seen": out_counts})

    grouped = stream_df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).alias("_g"),
    ).groupBy("_g")
    return grouped.applyInPandasWithState(
        update, _OUT, _BLOB_STATE, "append", GroupStateTimeout.NoTimeout
    )
