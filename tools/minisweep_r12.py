"""Round-12 accumulation probe: run the bench's _op block then its
cooled re-samples in ONE session (the bench's exact structure), to
quantify how much cross-query engine state (checkpoint blocks, heap)
inflates later entries — the round-11 cooled-block anomaly
(q114_op 6.6 s in-sweep -> 19.2 s cooled).

Usage: python tools/minisweep_r12.py [--sf DIR] [--pre-cooled-sweep]
       [--gc-each]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--pre-cooled-sweep", action="store_true")
    ap.add_argument("--gc-each", action="store_true")
    args = ap.parse_args()

    from bench import OP_QUERIES, _hygiene_sweep, _time_one
    from etl_opensky_spark.queries import BENCH_ONLY_QUERIES, QUERIES
    from etl_opensky_spark.session import get_spark

    catalog = {**QUERIES, **BENCH_ONLY_QUERIES}
    spark = get_spark("minisweep_r12")
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    catalog["q215_incremental_dedup_op"](spark, args.sf)  # untimed prebuild
    _hygiene_sweep(spark)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in OP_QUERIES:
        _time_one(spark, catalog[name], name, args.sf, timings, errors)
        if args.gc_each:
            _hygiene_sweep(spark)
    if args.pre_cooled_sweep:
        _hygiene_sweep(spark)
    cooled: dict[str, float] = {}
    for name in OP_QUERIES:
        _time_one(
            spark, catalog[name], f"{name}~cooled", args.sf, cooled, errors
        )
        if args.gc_each:
            _hygiene_sweep(spark)
    n_rdd = spark.sparkContext._jsc.sc().getRDDStorageInfo().__len__()
    print(f"# live persisted RDDs at end: {n_rdd}", file=sys.stderr)
    for name in OP_QUERIES:
        a, b = timings.get(name), cooled.get(f"{name}~cooled")
        ratio = (b / a) if (a and b) else None
        print(
            f"{name}: sweep={a} cooled={b} "
            f"ratio={ratio:.2f}" if ratio else f"{name}: sweep={a} cooled={b}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
