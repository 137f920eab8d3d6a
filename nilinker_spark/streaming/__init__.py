"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10) — this module is the
graft's forward-looking streaming path: the same extraction operator run
incrementally over an arriving webtext table, with event-time windowed
mention counts under a watermark.  Semantics are identical to the batch
operators (same pure functions), so a backfill and the stream agree.
"""

from nilinker_spark.streaming.extract_stream import (  # noqa: F401
    stream_mentions,
    windowed_mention_counts,
)
