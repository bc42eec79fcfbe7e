"""Control-normalized isolated probe: the bench VM throttles under
sustained load (docs in .claude/skills/verify), so raw wall-clock A/B
pairs minutes apart are not comparable.  This probe samples a fixed
CPU-bound control workload (the bench's machine_control, q42) BEFORE
and AFTER each target, and reports raw seconds plus the control pair —
read targets as target/control ratios.

Usage: python tools/ab_probe.py [--sf DIR] [--n 2] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    from etl_opensky_spark.queries import BENCH_ONLY_QUERIES, QUERIES
    from etl_opensky_spark.session import get_spark

    catalog = {**QUERIES, **BENCH_ONLY_QUERIES}
    spark = get_spark("ab_probe")
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    def timed(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        catalog[name](spark, args.sf).count()
        return time.perf_counter() - t0

    timed("q42_embedding_dedup")  # control warm-up, discarded
    for name in args.queries:
        c0 = timed("q42_embedding_dedup")
        runs = [timed(name) for _ in range(args.n)]
        c1 = timed("q42_embedding_dedup")
        ctl = (c0 + c1) / 2
        rs = " ".join(f"{t:.3f}" for t in runs)
        norm = " ".join(f"{t / ctl:.2f}" for t in runs)
        print(
            f"{name}: runs=[{rs}] ctl=[{c0:.3f},{c1:.3f}] "
            f"norm=[{norm}]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
