"""One-off measurement: the hot-shingle df-cap's effect on the shared-
shingle dedup join (VERDICT r3 #3 — prove the cap with a number).

The sf tables have no boilerplate, so the quadratic-bucket hazard the cap
guards against never fires naturally.  This script derives a
boilerplate-injected corpus from the driver documents (a constant navbar
sentence appended to EVERY text — the deterministic stand-in for a site
template across a crawl) and runs ngram_jaccard_pairs with the cap off
and on, reporting wall, the shingle-bucket size distribution, and the
implied equi-join row count sum(C(df,2)).

Usage: python tools/bench_dedup_cap.py [sf_dir] [cap]
Results are recorded in BASELINE.md ("Hot-shingle cap measurement").
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from nilinker_spark.config import get_spark  # noqa: E402
from nilinker_spark.operators import corpus as C  # noqa: E402

NAVBAR = "home about contact privacy terms sitemap login search help news"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit(NAVBAR))
    )
    n_docs = docs.count()

    # bucket-size distribution of the raw shingle table (one scan)
    df_tbl = C.shingles(docs).groupBy("sh").agg(F.count("*").alias("df"))
    stats = df_tbl.agg(
        F.count("*").alias("shingles"),
        F.max("df").alias("max_df"),
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("join_rows"),
        F.sum(F.when(F.col("df") > cap, F.col("df") * (F.col("df") - 1) / 2)).alias(
            "join_rows_hot"
        ),
        F.sum(F.when(F.col("df") > cap, 1).otherwise(0)).alias("hot_shingles"),
    ).collect()[0]
    print(
        f"docs={n_docs} shingles={stats['shingles']} max_df={stats['max_df']} "
        f"join_rows_uncapped={int(stats['join_rows'])} "
        f"join_rows_in_hot_buckets={int(stats['join_rows_hot'] or 0)} "
        f"hot_shingles(df>{cap})={stats['hot_shingles']}"
    )

    # JIT/codegen warm on a slice, then timed runs (cap off / cap on)
    C.ngram_jaccard_pairs(docs.limit(200)).count()
    spark.catalog.clearCache()
    C.release_caches()
    for label, max_df in (("cap_off", None), (f"cap_{cap}", cap)):
        m: dict = {}
        t0 = time.monotonic()
        n_pairs = C.ngram_jaccard_pairs(docs, max_shingle_df=max_df, metrics_out=m).count()
        wall = time.monotonic() - t0
        dropped = m["hot_shingles"].count() if "hot_shingles" in m else 0
        print(f"{label}: wall={wall:.1f}s pairs={n_pairs} shingles_dropped={dropped}")
        spark.catalog.clearCache()
        C.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
