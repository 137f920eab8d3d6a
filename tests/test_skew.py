"""Skew hardening: hot blocking keys are capped deterministically with
drop metrics (no silent truncation), and output is invariant to input
partitioning (SURVEY.md §5 'Scale/skew test')."""

from __future__ import annotations

from pyspark.sql import functions as F

from nilinker_spark.operators.pairs import candidate_pairs, capped_blocks
from nilinker_spark.pipeline import resolve


def test_block_cap_and_drop_metrics(spark):
    # one stop-word-like block key shared by 100 forms, cap at 10
    rows = [(f"form{i:03d} hotword",) for i in range(100)] + [("solo other",)]
    forms = spark.createDataFrame(rows, "norm string")
    from nilinker_spark.operators.blocking import block_keys_df

    blocked = block_keys_df(forms)
    kept, metrics = capped_blocks(blocked, max_block=10)

    sizes = {r["block_key"]: r["n"] for r in kept.groupBy("block_key").agg(F.count("*").alias("n")).collect()}
    assert sizes["hotword"] == 10
    m = {r["block_key"]: (r["members"], r["dropped"]) for r in metrics.collect()}
    assert m["hotword"] == (100, 90), "dropped members must be reported, not silent"

    # deterministic: the kept members are the lexicographically smallest
    kept_hot = sorted(
        r["norm"] for r in kept.filter(F.col("block_key") == "hotword").collect()
    )
    assert kept_hot == sorted(f"form{i:03d} hotword" for i in range(100))[:10]


def test_pairs_bounded_by_cap(spark):
    rows = [(f"f{i:02d} hot",) for i in range(50)]
    forms = spark.createDataFrame(rows, "norm string")
    from nilinker_spark.operators.blocking import block_keys_df

    pairs, _ = candidate_pairs(block_keys_df(forms), max_block=8)
    # within the hot block at cap 8: at most C(8,2)=28 pairs from 'hot';
    # each form also blocks on its unique f-token (singletons, no pairs)
    assert pairs.count() <= 28


def test_resolve_invariant_to_partitioning(spark, kb, webtext_df):
    """Same clusters whether the input arrives in 1 partition or 16 —
    the determinism requirement that makes resume + F1 parity possible."""
    one = resolve(spark, webtext_df.repartition(1), kb).toPandas()
    many = resolve(spark, webtext_df.repartition(16), kb).toPandas()
    key = ["url", "mention_id"]
    a = one.sort_values(key).reset_index(drop=True)
    b = many.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
