"""Custom stateful streaming operator: cross-batch first-seen dedup.

``first_seen_forms`` emits each distinct normalized surface form ONCE
across the lifetime of the stream (state survives micro-batches and
restarts via the streaming checkpoint).  This is the streaming analog of
the pipeline's distinct-form memoization (≙ the reference's
read-modify-write kb_cache, /root/reference/src/REEL/pre_process.py:
250-307): new pages only pay scoring for forms never seen before.

Implemented with ``applyInPandasWithState`` — grouped per ``norm`` with a
single boolean-ish state row.  Two state policies:

- ``ttl_minutes=None`` (default): forms never expire — exact
  once-per-stream semantics, state grows with the distinct-form
  vocabulary (Zipf-bounded, but unbounded in the adversarial limit);
- ``ttl_minutes=N``: processing-time TTL since the LAST sighting — the
  state is bounded by the active vocabulary of the TTL window, and a
  form unseen for N minutes is emitted again on its next sighting.
  This is the 10^12-doc deployment mode (bounded state + a compacted
  downstream forms table absorbing the rare re-emissions).
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


def make_emit_first(ttl_ms: int | None = None):
    """Build the per-group handler; pure logic shared by both policies
    (unit-tested directly against a fake GroupState)."""

    def _emit_first(key, pdfs, state: GroupState):
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            # TTL expired with no new sightings: forget the form so a
            # future sighting re-emits it (bounded-state semantics)
            state.remove()
            return iter(())
        if state.exists:
            # form already emitted: consume and drop; with TTL, re-arm the
            # clock (TTL counts from the LAST sighting)
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return iter(())
        best_mid = None
        best_url = None
        for pdf in pdfs:
            for mid, url in zip(pdf["mention_id"], pdf["url"]):
                # deterministic representative: min mention_id
                if best_mid is None or mid < best_mid:
                    best_mid, best_url = mid, url
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if best_mid is None:
            return iter(())
        return iter(
            [pd.DataFrame({"norm": [key[0]], "first_mention_id": [best_mid], "first_url": [best_url]})]
        )

    return _emit_first


def first_seen_forms(mentions_stream: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """mentions stream -> one row per norm, emitted on first sighting
    (per TTL window when ``ttl_minutes`` is set — see module docstring)."""
    ttl_ms = None if ttl_minutes is None else int(ttl_minutes * 60_000)
    return (
        mentions_stream.select("norm", "mention_id", "url")
        .groupBy("norm")
        .applyInPandasWithState(
            make_emit_first(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
