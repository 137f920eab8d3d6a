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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _er_popen/_join_er + the warm/pin machinery)


def one_round() -> dict:
    return bench.multijvm_round()


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
