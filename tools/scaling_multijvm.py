"""Executor-model scaling control: 1 vs 4 identical local[2] JVMs.

The headline protocol (bench.py v7) runs local[2] vs local[8]
concurrently; its residual bias is asymmetric co-run interference (the
8-core neighbor depresses the 2-core level relatively more).  This
control removes that asymmetry by construction:

- the "N" level is ONE local[2] JVM pinned to 2 cores;
- the "4N" level is FOUR local[2] JVMs pinned to disjoint 2-core
  ranges, each processing the SAME per-JVM input — exactly how a
  cluster scales from 1 to 4 two-core executors;
- all FIVE processes run concurrently with a shared barrier, so every
  process faces four equal-size neighbors: per-process contention is
  symmetric between the levels, and host-noise windows are common-mode.

With equal per-JVM docs, scaling efficiency reduces to a wall ratio:

    eff = lo_wall / max(hi_walls)

(the 4N level is as fast as its slowest executor, like a real stage).

Usage: python tools/scaling_multijvm.py [n_rounds]   # default 3
Prints one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _er_popen/_join_er + the warm/pin machinery)


def one_round() -> dict:
    reps = bench.REPLICATE_PER_CPU * 2
    sync_dir = tempfile.mkdtemp(prefix="er_mj_")
    procs = {}
    procs["lo"] = bench._er_popen(2, reps, cores="2-3", sync_dir=sync_dir)
    for i in range(4):
        start = 4 + 2 * i
        procs[f"hi{i}"] = bench._er_popen(
            2, reps, cores=f"{start}-{start + 1}", sync_dir=sync_dir
        )
    t0 = time.monotonic()
    while len([f for f in os.listdir(sync_dir) if f.startswith("ready_")]) < 5:
        if time.monotonic() - t0 > 360:
            break
        time.sleep(0.2)
    with open(os.path.join(sync_dir, "go"), "w") as fh:
        fh.write("1")
    draws = {k: bench._join_er(p) for k, p in procs.items()}
    import shutil

    shutil.rmtree(sync_dir, ignore_errors=True)
    lo_wall = draws["lo"]["sec"]
    hi_walls = [draws[f"hi{i}"]["sec"] for i in range(4)]
    docs = draws["lo"]["docs"]
    return {
        "eff": round(lo_wall / max(hi_walls), 3),
        "lo_docs_per_sec": round(docs / lo_wall, 1),
        "hi_agg_docs_per_sec": round(4 * docs / max(hi_walls), 1),
        "hi_walls": [round(w, 1) for w in hi_walls],
        "lo_wall": round(lo_wall, 1),
    }


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # host warm, discarded (same rationale as bench.py)
    bench._join_er(bench._er_popen(32, bench.REPLICATE_PER_CPU * 8))
    rounds = []
    for _ in range(n_rounds):
        rounds.append(one_round())
        os.system("sync")
        time.sleep(2)
    print(
        json.dumps(
            {
                "protocol": "multijvm-1v4-local2",
                "eff_median": round(statistics.median(r["eff"] for r in rounds), 3),
                "rounds": rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
