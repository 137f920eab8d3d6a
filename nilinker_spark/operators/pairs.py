"""S3 — candidate pair generation: within-block self-join over distinct forms.

≙ the reference's per-document candidate-candidate O(n²) loop
(/root/reference/src/REEL/candidates.py:388-417), re-expressed as a
block-key self-join over *distinct normalized forms* so pair count is
vocabulary-bounded, not corpus-bounded.

Skew guard: a stop-word-like token would create a quadratic block (the
reference dodges this only via its fuzzy limit=10,
/root/reference/src/REEL/candidates.py:50-52).  We cap each block at
MAX_BLOCK_FORMS members with a deterministic order and *report* the
number of dropped members per block in a metrics DataFrame — no silent
truncation.  AQE skew-join splitting is the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nilinker_spark.oracle import MAX_BLOCK_FORMS


def capped_blocks(blocked: DataFrame, max_block: int = MAX_BLOCK_FORMS) -> tuple[DataFrame, DataFrame]:
    """Cap block membership deterministically; return (kept, drop_metrics).

    drop_metrics(block_key, members, dropped) has one row per over-cap
    block — the lineage/metrics surface for silent-truncation audits.
    """
    w = Window.partitionBy("block_key").orderBy("norm")
    ranked = blocked.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") <= max_block).drop("rn")
    metrics = (
        ranked.groupBy("block_key")
        .agg(F.count("*").alias("members"))
        .filter(F.col("members") > max_block)
        .withColumn("dropped", F.col("members") - F.lit(max_block))
    )
    return kept, metrics


def candidate_pairs(blocked: DataFrame, max_block: int = MAX_BLOCK_FORMS) -> tuple[DataFrame, DataFrame]:
    """(norm, block_key) -> distinct (norm_a, norm_b) with norm_a < norm_b."""
    kept, metrics = capped_blocks(blocked, max_block)
    a = kept.select(F.col("block_key"), F.col("norm").alias("norm_a"))
    b = kept.select(F.col("block_key"), F.col("norm").alias("norm_b"))
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("norm_a") < F.col("norm_b"))
        .select("norm_a", "norm_b")
        .dropDuplicates(["norm_a", "norm_b"])
    )
    return pairs, metrics
