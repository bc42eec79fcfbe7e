"""Feed-lifecycle scale microbenchmark (round 10): measures the
lakefeed trigger cost against feed history length, with and without
the round-10 cursor-pruned listing, plus vacuum_change_feed cost.

No SparkSession — the reader's offset logic is pure Python over the
directory layout, so the commit dirs are fabricated directly (tiny
parquet + the _PUBLISHED marker) and the probe isolates exactly the
per-trigger filesystem work a 100 TB deployment pays on an object
store (listing + marker HEADs).

Usage: python tools/bench_feed_scale.py [n_versions] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_feed(root: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_opensky_spark.sources.fs import PUBLISH_MARKER

    table = pa.table({"id": pa.array([1], pa.int64())})
    for v in range(2, n + 2):
        d = os.path.join(root, f"commit={v}")
        os.makedirs(d)
        pq.write_table(table, os.path.join(d, "part-0.parquet"))
        with open(os.path.join(d, PUBLISH_MARKER), "w"):
            pass


def main() -> None:
    import etl_opensky_spark.sources.lakefeed as LF
    from etl_opensky_spark.sources.lakefeed import LakeFeedStreamReader
    from etl_opensky_spark.sources.versioned import vacuum_change_feed

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    root = tempfile.mkdtemp(prefix="feedscale-")
    try:
        fabricate_feed(root, n)
        tip = n + 1

        # steady-state trigger, cursor at the tip (round-10 path)
        r = LakeFeedStreamReader({"path": root})
        r.latestOffset()                      # first probe: full sweep
        r.partitions({"version": 0}, {"version": tip})
        LF._N_PUBLISH_STATS = 0
        t0 = time.perf_counter()
        reps = 200
        for _ in range(reps):
            assert r.latestOffset() == {"version": tip}
        pruned_ms = (time.perf_counter() - t0) / reps * 1000
        pruned_stats = LF._N_PUBLISH_STATS / reps

        # the same trigger with no cursor (the pre-round-10 cost):
        # a fresh reader's first probe stats every dir
        LF._N_PUBLISH_STATS = 0
        t0 = time.perf_counter()
        reps2 = 20
        for _ in range(reps2):
            fresh = LakeFeedStreamReader({"path": root})
            assert fresh.latestOffset() == {"version": tip}
        full_ms = (time.perf_counter() - t0) / reps2 * 1000
        full_stats = LF._N_PUBLISH_STATS / reps2

        # retention: vacuum all but the newest 50
        t0 = time.perf_counter()
        dropped = vacuum_change_feed(root, keep_last=50)
        vacuum_ms = (time.perf_counter() - t0) * 1000

        # post-vacuum full probe: bounded by the retained window
        LF._N_PUBLISH_STATS = 0
        fresh = LakeFeedStreamReader({"path": root})
        fresh.latestOffset()
        post_vacuum_stats = LF._N_PUBLISH_STATS

        out = {
            "n_versions": n,
            "steady_trigger_ms": round(pruned_ms, 3),
            "steady_trigger_marker_stats": pruned_stats,
            "uncursored_trigger_ms": round(full_ms, 3),
            "uncursored_trigger_marker_stats": full_stats,
            "vacuum_ms": round(vacuum_ms, 1),
            "n_dropped": len(dropped),
            "post_vacuum_first_probe_stats": post_vacuum_stats,
        }
        print(json.dumps(out))
        if len(sys.argv) > 2:
            with open(sys.argv[2], "w") as fh:
                json.dump(out, fh, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
