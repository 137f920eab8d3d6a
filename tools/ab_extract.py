"""A/B: Arrow-scan extraction vs zero-Python relational extraction.

VERDICT r2 task 2 asked for a recorded A/B of the two extraction engines
at the scaling levels, because the relational path has no Python workers
(so local[k] needs only k runnable threads).  Usage:

    python tools/ab_extract.py [cpus ...]      # default: 2 8

Each (cpus, engine) cell runs in-process back-to-back (same JVM, same
checkpointed input) with one warm pass per engine; prints docs/sec for
both engines at each level plus the 4x-scaling efficiency per engine.
Pin externally with taskset for like-for-like cells (the caller script
in BASELINE.md does).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE_PER_CPU = int(os.environ.get("SPARK_GRAFT_ER_REPLICATE_PER_CPU", "64"))


def run_level(cpus: int) -> dict:
    from nilinker_spark.config import get_spark
    from nilinker_spark.operators.extract import (
        extract_mentions_df,
        extract_mentions_relational,
    )
    from nilinker_spark.sources.webtext import (
        gazetteer_from_documents,
        load_table,
        webtext_from_documents,
    )

    spark = get_spark(
        master=f"local[{cpus}]", app_name=f"ab_extract_{cpus}", shuffle_partitions=cpus
    )
    docs = load_table(spark, SF_DIR, "documents")
    gazetteer = gazetteer_from_documents(docs)
    reps = REPLICATE_PER_CPU * cpus
    webtext = (
        webtext_from_documents(docs, replicate=reps)
        .select("url", "html", "lang")
        .localCheckpoint(eager=True)
    )
    n = webtext.count()
    out = {"cpus": cpus, "docs": n}
    for name, fn in (("arrow", extract_mentions_df), ("relational", extract_mentions_relational)):
        fn(spark, webtext_from_documents(docs, replicate=8), gazetteer).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, webtext, gazetteer).count()
            best = min(best, time.monotonic() - t0)
        out[name] = round(n / best, 1)
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--level":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    import shutil
    import subprocess

    cpus_list = [int(c) for c in sys.argv[1:]] or [2, 8]
    levels = []
    for c in cpus_list:
        cmd = [sys.executable, os.path.abspath(__file__), "--level", str(c)]
        if shutil.which("taskset"):
            start = 2 if c + 2 <= (os.cpu_count() or c) else 0
            cmd = ["taskset", "-c", f"{start}-{start + c - 1}"] + cmd
        out = subprocess.check_output(cmd, stderr=subprocess.DEVNULL)
        levels.append(json.loads(out.decode().strip().splitlines()[-1]))
    result = {"levels": levels}
    if len(levels) == 2 and levels[1]["cpus"] == 4 * levels[0]["cpus"]:
        for eng in ("arrow", "relational"):
            result[f"eff_{eng}"] = round(levels[1][eng] / levels[0][eng] / 4, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
