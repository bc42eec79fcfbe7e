"""Round-11 optimization profiler: isolate one or more catalog queries,
time them with the bench's own methodology (plan build + execution +
count) plus a noop-sink sample (guide §1.4 — times every column of every
row without the count()'s column pruning), and write
``plans/r11/<query>_<tag>.txt`` with the ``explain("formatted")`` output.

Usage:
    python tools/profile_r11.py [--sf DIR] [--tag before|after] [--n 3]
        [--no-noop] query [query ...]

Each query gets: n timed runs (first = cold within this session, rest
warm), reported individually, plus the plan dump.  Jobs are labelled via
setJobDescription so a UI/event-log reader can attribute stages.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--plans-dir", default="plans/r11")
    args = ap.parse_args()

    from etl_opensky_spark.queries import BENCH_ONLY_QUERIES, QUERIES
    from etl_opensky_spark.session import get_spark

    catalog = {**QUERIES, **BENCH_ONLY_QUERIES}
    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("profile_r11")
    # same warm-up the bench does
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    for name in args.queries:
        fn = catalog[name]
        times = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            rows = df.count()
            times.append(time.perf_counter() - t0)
        # plan dump from the last (warm) build
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        except Exception as exc:  # noqa: BLE001
            plan = ""
            print(f"# {name}: no plan ({exc})", file=sys.stderr)
        noop_s = None
        if not args.no_noop:
            spark.sparkContext.setJobDescription(f"{name} noop")
            t0 = time.perf_counter()
            df2 = fn(spark, args.sf)
            df2.write.format("noop").mode("overwrite").save()
            noop_s = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        runs = " ".join(f"{t:.3f}" for t in times)
        extra = f" noop={noop_s:.3f}" if noop_s is not None else ""
        print(f"{name}: rows={rows} runs=[{runs}]{extra}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
