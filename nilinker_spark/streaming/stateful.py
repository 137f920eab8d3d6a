"""Custom stateful streaming operator: cross-batch first-seen dedup.

``first_seen_forms`` emits each distinct normalized surface form ONCE
across the lifetime of the stream (state survives micro-batches and
restarts via the streaming checkpoint).  This is the streaming analog of
the pipeline's distinct-form memoization (≙ the reference's
read-modify-write kb_cache, /root/reference/src/REEL/pre_process.py:
250-307): new pages only pay scoring for forms never seen before.

Implemented with ``applyInPandasWithState`` — grouped per ``norm`` with a
single boolean-ish state row; no timeout (forms never expire; at 10^12
docs one would bound state with TTL + a compacted forms table instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("norm", StringType()),
        StructField("first_mention_id", StringType()),
        StructField("first_url", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _emit_first(key, pdfs, state: GroupState):
    import pandas as pd

    if state.exists:
        # form already emitted in an earlier micro-batch: consume and drop
        for _ in pdfs:
            pass
        return iter(())
    best_mid = None
    best_url = None
    for pdf in pdfs:
        for mid, url in zip(pdf["mention_id"], pdf["url"]):
            # deterministic representative: min mention_id
            if best_mid is None or mid < best_mid:
                best_mid, best_url = mid, url
    state.update((1,))
    if best_mid is None:
        return iter(())
    return iter([pd.DataFrame({"norm": [key[0]], "first_mention_id": [best_mid], "first_url": [best_url]})])


def first_seen_forms(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream -> one row per norm, emitted on first sighting."""
    return (
        mentions_stream.select("norm", "mention_id", "url")
        .groupBy("norm")
        .applyInPandasWithState(
            _emit_first,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
