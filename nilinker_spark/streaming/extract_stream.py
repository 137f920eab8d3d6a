"""Incremental mention extraction over an arriving webtext table.

``readStream`` (file source, parquet) -> the SAME mapInPandas extraction
used in batch (byte-identical per url by construction) -> sink.  Late
pages are handled with a watermark on ``warc_ts``; the windowed count is
the streaming twin of the batch term-frequency/IC aggregation
(≙ /root/reference/src/REEL/information_content.py:17-27, which the
reference recomputes from scratch per corpus — here it maintains itself
incrementally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def read_webtext_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream over a webtext directory (schema declared, never
    inferred — streaming sources require it anyway)."""
    return (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_mentions(
    spark: SparkSession, webtext_stream: DataFrame, gazetteer: set[str]
) -> DataFrame:
    """Streaming extraction: identical operator to the batch S1 — the
    mapInPandas UDF is stateless, so it lifts to streaming unchanged."""
    from nilinker_spark.operators.extract import MENTIONS_SCHEMA

    # same shape as the batch S1: mapInPandas on a streaming DF produces an
    # incremental plan with identical semantics (stateless pure function)
    gz = spark.sparkContext.broadcast(sorted(gazetteer))

    def scan(batches):
        import pandas as pd

        from nilinker_spark.functions.normalize import extract_text, norm_form
        from nilinker_spark.operators.extract import (
            _NORM_CACHE,
            _NORM_CACHE_MAX,
            _evict_norm_cache,
        )
        from nilinker_spark.oracle import extract_mentions, gazetteer_index

        gset = set(gz.value)
        gidx = gazetteer_index(gset)
        for pdf in batches:
            urls, mids, surfaces, poss, norms, tss = [], [], [], [], [], []
            if len(_NORM_CACHE) > _NORM_CACHE_MAX:
                # shared Zipf-head-preserving eviction (VERDICT r4 #7):
                # long-lived streaming workers keep the frequency head
                # warm across evictions exactly like batch workers
                # (a clear() re-paid the regex for every head token)
                _evict_norm_cache()
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                text = extract_text(bytes(html))
                for mid, surface, pos in extract_mentions(url, text, gset, _NORM_CACHE, gidx):
                    urls.append(url)
                    mids.append(mid)
                    surfaces.append(surface)
                    poss.append(pos)
                    norms.append(norm_form(surface))
                    tss.append(ts)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "mention_id": mids,
                    "surface": surfaces,
                    "pos": poss,
                    "norm": norms,
                    "warc_ts": tss,
                }
            )

    return (
        webtext_stream.filter(F.col("lang") == "en")
        .select("url", "warc_ts", "html")
        .mapInPandas(scan, MENTIONS_SCHEMA + ", warc_ts timestamp")
    )


def windowed_mention_counts(
    mentions_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed mention counts with late-data watermark:
    (window_start, norm, n).  Append-mode-compatible (watermarked agg)."""
    return (
        mentions_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("norm"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "norm", "n")
    )


def stream_resolve(
    spark: SparkSession,
    webtext_stream: DataFrame,
    gazetteer: set[str],
    clusters: DataFrame,
) -> DataFrame:
    """Incremental serving path: streaming mention extraction joined to a
    STATIC cluster table (the batch pipeline's `clusters` checkpoint) —
    a stream-static broadcast join, natively incremental in Structured
    Streaming.  Forms never seen by the batch run resolve to themselves
    (singleton clusters), exactly like `assign_clusters`; a periodic
    batch `run_incremental` folds them in properly.
    """
    mentions = stream_mentions(spark, webtext_stream, gazetteer)
    lab = clusters.select("norm", "cluster_id")
    return mentions.join(F.broadcast(lab), "norm", "left").select(
        "url",
        "mention_id",
        "surface",
        "pos",
        "norm",
        F.coalesce("cluster_id", "norm").alias("cluster_id"),
        "warc_ts",
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    gazetteer: set[str],
) -> None:
    """Drain everything currently in ``input_path`` (availableNow) into a
    parquet mentions table; restartable from the streaming checkpoint —
    the streaming analog of the batch pipeline's resume."""
    stream = read_webtext_stream(spark, input_path)
    mentions = stream_mentions(spark, stream, gazetteer)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def stream_sessionize(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via native session windows:
    (user_id, session_start, session_end, n_events).

    ``F.session_window`` keeps per-key state that MERGES adjacent events
    closer than ``gap`` — the stateful streaming twin of the batch
    lag-over-window sessionization (the §2.4 `sessionization` query) —
    and the watermark closes sessions (and frees their state) once event
    time passes session_end + watermark, so state is bounded by the
    active-session population at any watermark horizon, not by history.
    Append-mode-compatible: rows emit only when their session closes.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
