"""Data-scaling audit: per-query wall time at sf0.01 vs sf0.1.

The core-scaling sections of bench.py prove the engine uses added
parallelism; this tool proves the complementary axis — that work grows
~linearly with DATA.  Every pair-generating operator here has a
quadratic failure mode (shared-shingle joins, LSH buckets, IVF cells);
a measured time ratio near the 10x data ratio is direct evidence the
bounded-bucket designs hold as the corpus grows, which is the claim
that matters at 100 TB.

    python tools/data_scaling.py [query ...]   # default: corpus family

Method: one shared session per sf level; per query, one discarded warm
pass then best-of-2 timed passes (same best-of discipline as the bench
battery; the host has multi-minute noise periods — see BASELINE.md).
The ratio denominator/numerator both carry the session's fixed job
overhead (~0.3-1 s at these sizes), so printed ratios UNDERSTATE true
linearity headroom for the fast queries; read ratio ≲ 10 as linear-or
-better, and treat anything >> 10 as a quadratic red flag.  Prints one
JSON line: {query: {lo_s, hi_s, ratio}} plus the row counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO_SF = os.environ.get("SPARK_GRAFT_DATA_LO", "/root/testdata/sf0.01")
HI_SF = os.environ.get("SPARK_GRAFT_DATA_HI", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

DEFAULT = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "clean_corpus",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "embedding_neardup_lsh",
    "decontaminate",
    "lm_bigram_score",
    "importance_resample",
    "pack_sequences",
    "text_quality",
    "repetition_metrics",
    "fingerprint",
]


def main() -> None:
    import __spark_entry__ as entrymod

    from nilinker_spark.config import get_spark

    names = sys.argv[1:] or DEFAULT
    qs = entrymod.queries()
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4)
    spark.sparkContext.setLogLevel("ERROR")

    # host warm-up: a discarded pass over the heaviest query at the big
    # level (page cache + cpufreq + codegen warm; CLAUDE.md rule)
    qs["dedup_minhash_lsh"](spark, HI_SF).count()
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in names:
        cell: dict[str, float] = {}
        for key, sf in (("lo", LO_SF), ("hi", HI_SF)):
            qs[name](spark, sf).count()  # warm (plan + broadcast + cache)
            spark.catalog.clearCache()
            best = float("inf")
            rows = 0
            for _ in range(2):
                t0 = time.monotonic()
                rows = qs[name](spark, sf).count()
                best = min(best, time.monotonic() - t0)
                spark.catalog.clearCache()
            cell[f"{key}_s"] = round(best, 3)
            cell[f"{key}_rows"] = rows
        cell["ratio"] = round(cell["hi_s"] / cell["lo_s"], 2)
        out[name] = cell
        print(f"# {name}: lo {cell['lo_s']}s hi {cell['hi_s']}s ratio {cell['ratio']}", flush=True)

    print(json.dumps({"metric": "data_scaling", "lo": LO_SF, "hi": HI_SF, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
