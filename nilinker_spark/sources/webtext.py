"""Adapters from the synthetic testdata tables to the webtext input shape.

The pipeline's authoritative input is the Iceberg-style table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint).  ``webtext_from_documents`` derives that shape
deterministically from the driver-provided ``documents`` parquet so the
entry point and bench run against driver data without synthesizing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def webtext_from_documents(docs: DataFrame, replicate: int = 1, partitions: int | None = None) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> webtext shape.

    ``replicate`` > 1 tiles the corpus with distinct urls (bench scaling
    knob); text content is unchanged so per-url extraction stays pure.
    ``partitions`` re-splits the result — the testdata ships as a single
    parquet file, which would otherwise serialize the whole extraction
    stage into one task (a 100 TB table arrives pre-split; this knob
    stands in for that).
    """
    base = docs
    if replicate > 1:
        base = docs.crossJoin(
            F.broadcast(
                docs.sparkSession.range(replicate).select(F.col("id").alias("rep"))
            )
        )
    else:
        base = docs.withColumn("rep", F.lit(0))
    if partitions is None:
        # half the task slots for the python extraction stage: during
        # mapInPandas the JVM feeder thread AND its python worker are both
        # runnable, so cores/2 concurrent tasks saturate the cores without
        # oversubscribing (uniform rows -> no stragglers from fewer tasks)
        partitions = max(1, docs.sparkSession.sparkContext.defaultParallelism // 2)
    if partitions > 1:
        base = base.repartition(partitions)
    return base.select(
        F.concat(F.lit("doc://"), F.col("rep"), F.lit("/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def gazetteer_from_documents(docs: DataFrame, top_n: int = 100) -> set[str]:
    """Deterministic gazetteer: top-N word BIGRAMS by frequency (ties by
    surface asc) — the KB-alias stand-in for driver data.

    Multi-token surfaces, like real KB aliases: extraction density stays
    realistic (a match at a small fraction of token positions) and the
    greedy longest-match scan does its full 4..1-gram probe work."""
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    bg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    rows = (
        docs.select(F.explode(bg).alias("surface"))
        .filter(F.size(F.split("surface", " ")) == 2)
        .groupBy("surface")
        .count()
        .orderBy(F.desc("count"), F.asc("surface"))
        .limit(top_n)
        .collect()
    )
    return {r["surface"] for r in rows}
