"""Dump the executed physical plan of every catalog query to
``plans_out/<name>.txt`` — the artifact to eyeball for shuffle count,
broadcast decisions, pushed filters, and codegen spans.

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    out_dir = "plans_out"
    os.makedirs(out_dir, exist_ok=True)

    from etl_opensky_spark.queries import QUERIES
    from etl_opensky_spark.session import get_spark

    spark = get_spark("explain_all")
    summary = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()  # finalize AQE plan
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming memory-table etc.
            plan = f"(no static plan: {exc})"
        with open(f"{out_dir}/{name}.txt", "w") as fh:
            fh.write(plan)
        shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
        broadcasts = len(re.findall(r"BroadcastExchange", plan))
        summary.append((name, shuffles, broadcasts))
        print(f"{name}: {shuffles} shuffle(s), {broadcasts} broadcast(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
