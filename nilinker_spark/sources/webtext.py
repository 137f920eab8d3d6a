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
        partitions = docs.sparkSession.sparkContext.defaultParallelism * 2
    if partitions > 1:
        base = base.repartition(partitions)
    return base.select(
        F.concat(F.lit("doc://"), F.col("rep"), F.lit("/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def gazetteer_from_documents(docs: DataFrame, top_n: int = 100, min_len: int = 4) -> set[str]:
    """Deterministic gazetteer: top-N >=min_len-char tokens by frequency
    (ties broken by token asc) — the KB-alias stand-in for driver data."""
    from nilinker_spark.operators.corpus import doc_tokens

    rows = (
        doc_tokens(docs, min_len=min_len)
        .groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(top_n)
        .collect()
    )
    return {r["token"] for r in rows}
