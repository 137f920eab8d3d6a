"""Host-saturation control for the distributed-middle scaling number.

Question it answers: is the measured ~0.5-0.6 middle efficiency (2→8
cores) a plan defect or a host ceiling?  Method: run the IDENTICAL
2-core middle workload (a) once, solo, and (b) as FOUR simultaneous
independent copies on disjoint pinned core pairs — each copy is its own
JVM computing its own 100k-form middle, so there is no shared plan, no
shared shuffle, no scheduler coupling; the ONLY shared resource is the
host (memory bus / LLC).  All five children align both their run start
AND their middle sections with file barriers (the bench's double-barrier
machinery).

If each of the 4 copies slows to ~t_solo/x, the box delivers only
4x-aggregate-throughput x = 4*t_solo/t_4way of this workload at 8 busy
cores — an upper bound on ANY 2→8 single-job efficiency measurable here,
because a single 8-core job uses the same cores against the same bus.

Usage: python tools/middle_saturation.py   (results -> BASELINE.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _await(sync_dir: str, prefix: str, n: int, timeout_s: float = 420.0) -> None:
    t0 = time.monotonic()
    while len([f for f in os.listdir(sync_dir) if f.startswith(prefix)]) < n:
        if time.monotonic() - t0 > timeout_s:
            break
        time.sleep(0.2)


def run_level(n_children: int) -> list[dict]:
    dist_env = {
        "SPARK_GRAFT_VOCAB_VARIANTS": str(bench.DIST_VARIANTS),
        "SPARK_GRAFT_GAZ_BASE": str(bench.DIST_GAZ_BASE),
        "SPARK_GRAFT_DIST_DOC_LIMIT": str(bench.DIST_DOC_LIMIT),
        "SPARK_GRAFT_MID_BARRIER": "1",
    }
    sync_dir = tempfile.mkdtemp(prefix="mid_sat_")
    try:
        procs = []
        for i in range(n_children):
            start = 2 + 2 * i
            procs.append(
                bench._er_popen(
                    2,
                    bench.DIST_VARIANTS,
                    cores=f"{start}-{start + 1}",
                    sync_dir=sync_dir,
                    extra_env=dist_env,
                )
            )
        _await(sync_dir, "ready_", n_children)
        with open(os.path.join(sync_dir, "go"), "w") as fh:
            fh.write("1")
        _await(sync_dir, "mid_ready_", n_children)
        with open(os.path.join(sync_dir, "go_mid"), "w") as fh:
            fh.write("1")
        return [bench._join_er(p) for p in procs]
    finally:
        shutil.rmtree(sync_dir, ignore_errors=True)


def main() -> None:
    solo = run_level(1)[0]
    time.sleep(3)
    four = run_level(4)
    t1 = solo["middle_s"]
    t4 = max(d["middle_s"] for d in four)
    t4_all = [round(d["middle_s"], 1) for d in four]
    agg = 4 * t1 / t4
    print(
        f"solo 2-core middle: {t1:.1f}s | 4x concurrent 2-core middles: "
        f"{t4_all} (max {t4:.1f}s)"
    )
    print(
        f"aggregate-throughput ratio at 8 busy cores vs 2: {agg:.2f}x "
        f"-> host ceiling on ANY 2->8 efficiency here: {agg / 4:.2f}"
    )


if __name__ == "__main__":
    main()
