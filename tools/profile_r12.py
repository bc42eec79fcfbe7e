"""Round-12 optimization profiler: like tools/profile_r11.py but each
query runs in its OWN subprocess (fresh JVM + block manager), so a
measurement can never inherit another query's checkpoint blocks or heap
state — the round-11 lesson that in-sweep and isolated numbers diverge
precisely on the checkpoint-heavy operators.

Usage:
    python tools/profile_r12.py [--sf DIR] [--tag before|after] [--n 3]
        [--no-noop] [--plans-dir plans/r12] query [query ...]

Parent mode forks one child per query; child mode (--child) is the
per-query worker using the bench's own methodology (plan build +
execution + count) plus a noop-sink sample (guide §1.4) and an
``explain("formatted")`` dump to ``plans/r12/<query>_<tag>.txt``.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_child(args) -> int:
    from etl_opensky_spark.queries import BENCH_ONLY_QUERIES, QUERIES
    from etl_opensky_spark.session import get_spark

    catalog = {**QUERIES, **BENCH_ONLY_QUERIES}
    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("profile_r12")
    spark.read.parquet(f"{args.sf}/region.parquet").count()  # bench warm-up
    name = args.queries[0]
    fn = catalog[name]
    times = []
    for i in range(args.n):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        rows = df.count()
        times.append(time.perf_counter() - t0)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(
            os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
        ) as fh:
            fh.write(buf.getvalue())
    except Exception as exc:  # noqa: BLE001
        print(f"# {name}: no plan ({exc})", file=sys.stderr)
    noop_s = None
    if not args.no_noop:
        spark.sparkContext.setJobDescription(f"{name} noop")
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        noop_s = time.perf_counter() - t0
    runs = " ".join(f"{t:.3f}" for t in times)
    extra = f" noop={noop_s:.3f}" if noop_s is not None else ""
    print(f"{name}: rows={rows} runs=[{runs}]{extra}", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        return run_child(args)
    rc = 0
    for name in args.queries:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            "--sf", args.sf, "--tag", args.tag, "--n", str(args.n),
            "--plans-dir", args.plans_dir, name,
        ]
        if args.no_noop:
            cmd.insert(2, "--no-noop")
        r = subprocess.run(cmd)
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
