"""S4 — pairwise scoring: embedding cosine + string feature, JVM-side.

The expensive model math (attention phrase vectors) already ran once per
distinct form in S2; pair scoring is therefore a *native* Catalyst
expression — zip_with/aggregate dot product on the two L2-normalized
vector columns plus built-in levenshtein — keeping the hot O(pairs) path
inside whole-stage codegen with zero Python crossings.

≙ the reference's per-pair scoring inside REEL candidate files + the
NILINKER softmax ranking (/root/reference/src/NILINKER/nilinker.py:150-153),
collapsed to the pair-similarity the north rule requires (embedding
dot-product + Levenshtein-family string features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nilinker_spark.oracle import ALPHA, TAU


def dot_f64(col_a: str, col_b: str):
    """Dot product of two array<float> columns, accumulated in float64
    (matches the oracle's numpy float64 accumulation exactly — float32
    values cast to double are exact)."""
    prods = F.zip_with(
        F.col(col_a), F.col(col_b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def lev_ratio_col(col_a: str, col_b: str):
    """1 - levenshtein/max(len) — built-in, codegen'd."""
    m = F.greatest(F.length(col_a), F.length(col_b))
    return F.when(m == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(F.col(col_a), F.col(col_b)) / m
    )


def score_pairs(pairs: DataFrame, pvs: DataFrame, alpha: float = ALPHA) -> DataFrame:
    """(norm_a, norm_b) x (norm, pv) -> (norm_a, norm_b, score).

    The phrase-vector table is distinct-form-sized -> broadcast both joins;
    the pair table never shuffles.
    """
    pv_a = pvs.select(F.col("norm").alias("norm_a"), F.col("pv").alias("pv_a"))
    pv_b = pvs.select(F.col("norm").alias("norm_b"), F.col("pv").alias("pv_b"))
    scored = (
        pairs.join(F.broadcast(pv_a), "norm_a")
        .join(F.broadcast(pv_b), "norm_b")
        .withColumn(
            "score",
            F.lit(alpha) * dot_f64("pv_a", "pv_b")
            + F.lit(1.0 - alpha) * lev_ratio_col("norm_a", "norm_b"),
        )
        .select("norm_a", "norm_b", "score")
    )
    return scored


def similarity_edges(scored: DataFrame, tau: float = TAU) -> DataFrame:
    """S5 — threshold to the edge DataFrame feeding connected components."""
    return scored.filter(F.col("score") >= tau).select(
        F.col("norm_a").alias("src"), F.col("norm_b").alias("dst")
    )
