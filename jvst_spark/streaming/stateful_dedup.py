"""Stateful streaming dedup: drop already-seen doc_ids across
micro-batches with applyInPandasWithState.

The streaming analogue of the table uniqueness check — state holds the
set of seen keys per hash group; late re-arrivals of a key are emitted
to the duplicates stream instead of the clean stream. State is bounded
by the key cardinality per group (at production scale: pair with a
retention timeout or an upstream bucket-pruned reprocess window).
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
_STATE = StructType([StructField("seen", StringType(), True)])


def streaming_duplicates(
    stream_df: DataFrame, id_col: str = "doc_id", n_groups: int = 64
) -> DataFrame:
    """Emit (doc_id, n_seen) whenever a doc_id arrives that was already
    seen in any earlier micro-batch (n_seen = occurrences so far incl.
    current). First arrivals emit nothing."""

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
        update, _OUT, _STATE, "append", GroupStateTimeout.NoTimeout
    )
