"""Scale evidence for the round-10 surface (VERDICT r10 next-round #4):
sf0.1 -> sf1 exponents for subset-column appends, metadata-only DROP
COLUMN (+ the physical retirement compaction), and a leased
multi-writer change-feed drain.

The 100 TB claims under test:

- a SUBSET-COLUMN APPEND's commit cost is manifest-bound (footer-only
  stats for the appended files; absent columns recorded as all-null
  stats without touching data), so appending a FIXED batch should be
  near-flat while the table underneath grows 10x in rows and files;
- DROP COLUMN is a metadata-only commit: O(#files) manifest rewrite,
  zero data movement — near-flat in table size;
- the physical retirement (compact_versioned after the drop) IS
  data-bound by design — recorded honestly alongside, not hidden;
- a leased multi-writer drain (2 concurrent materializers,
  lease_ttl) splits the feed's versions exactly once with no
  contention cost beyond one conditional PUT + heartbeat per version.

Writes results into BENCH_sf1.json under experiments.{subset_append,
drop_column_retire, leased_feed_drain}.

Usage: python tools/bench_round11_scale.py [out_json]
  (data dirs fixed: /root/testdata/sf0.1 and scaledata/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_opensky_spark.session import get_spark  # noqa: E402
from etl_opensky_spark.sources.lakefeed import _commit_versions  # noqa: E402
from etl_opensky_spark.sources.lakesource import (  # noqa: E402
    register_versioned_source,
)
from etl_opensky_spark.sources.versioned import (  # noqa: E402
    compact_versioned,
    drop_column,
    materialize_change_feed,
    merge_versioned,
    read_version,
    write_version,
)

WORK = "/tmp/spark_graft_r11_scale"
SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "scaledata/sf1"}


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("price_c"),
        (F.col("o_orderkey") % 8).cast("int").alias("bucket"),
    )


def _timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def bench_subset_append(spark, sf, sf_dir, files_per_sf):
    """Fixed 10k-row single-column append onto a table that is 10x
    bigger (rows AND files) at sf1 — commit cost should stay
    near-flat (manifest-bound)."""
    base = os.path.join(WORK, f"subset_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    orders = _orders(spark, sf_dir)
    n_rows = orders.count()
    write_version(
        orders.select("k", "price_c").repartition(files_per_sf),
        base, stats_cols=("price_c",),
    )
    batch = (
        spark.range(10_000)
        .select((F.col("id") + 2_000_000_000).alias("k"))
        .coalesce(1)
    )
    # one timed subset append per rep (each commits a new version —
    # idempotent for timing purposes, the table just grows by 10k)
    sec = _timed(
        lambda: batch.write.format("versioned").mode("append").save(base)
    )
    return {
        "table_rows": n_rows,
        "table_files": files_per_sf,
        "append_rows": 10_000,
        "append_sec": sec,
    }


def bench_drop_column(spark, sf, sf_dir, files_per_sf):
    base = os.path.join(WORK, f"drop_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    orders = _orders(spark, sf_dir)
    n_rows = orders.count()
    write_version(
        orders.repartition(files_per_sf), base,
        partition_by=("bucket",), stats_cols=("price_c",),
    )
    t0 = time.perf_counter()
    version = drop_column(spark, base, "price_c")
    drop_sec = round(time.perf_counter() - t0, 3)
    # physical retirement: data-bound by design, recorded honestly
    t0 = time.perf_counter()
    compact_versioned(
        spark, base, partition_by=("bucket",),
        target_rows_per_file=2_000_000,
    )
    retire_sec = round(time.perf_counter() - t0, 3)
    tip_n = read_version(spark, base).count()
    assert tip_n == n_rows
    return {
        "table_rows": n_rows,
        "committed_version": version,
        "drop_sec": drop_sec,
        "retire_compact_sec": retire_sec,
    }


def bench_leased_drain(spark, sf, sf_dir, n_commits=6):
    """Two concurrent leased materializers drain an n-commit feed;
    wall time + split recorded.  Change volume scales with sf (each
    commit updates 1/50 of the orders keys)."""
    base = os.path.join(WORK, f"drain_src_{sf}")
    feed = os.path.join(WORK, f"drain_feed_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)
    orders = _orders(spark, sf_dir).select("k", "price_c")
    write_version(orders, base)
    for i in range(n_commits):
        upd = orders.filter(F.col("k") % 50 == i).select(
            "k", (F.col("price_c") + 1).alias("price_c")
        )
        merge_versioned(spark, base, upd, ["k"])
    results: list[tuple[int, int]] = []
    errors: list[BaseException] = []

    def drain():
        try:
            results.append(
                materialize_change_feed(
                    spark, base, feed, ["k"], lease_ttl=300
                )
            )
        except BaseException as exc:  # noqa: BLE001 — recorded, re-raised
            errors.append(exc)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=drain) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = round(time.perf_counter() - t0, 3)
    if errors:
        raise errors[0]
    assert sum(n for n, _ in results) == n_commits
    assert len(_commit_versions(feed)) == n_commits
    return {
        "n_commits": n_commits,
        "change_rows": sum(r for _, r in results),
        "split": sorted(n for n, _ in results),
        "drain_wall_sec": wall,
    }


def _exponent(v01: float, v1: float) -> float:
    import math

    if v01 <= 0 or v1 <= 0:
        return 0.0
    return round(math.log10(v1 / v01), 2)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    spark = get_spark("bench_round11_scale")
    register_versioned_source(spark)
    os.makedirs(WORK, exist_ok=True)
    files = {"sf0.1": 32, "sf1": 320}
    res: dict = {}
    for name, fn in (
        ("subset_append", bench_subset_append),
        ("drop_column_retire", bench_drop_column),
    ):
        res[name] = {
            sf: fn(spark, sf, sf_dir, files[sf])
            for sf, sf_dir in SFS.items()
        }
    res["leased_feed_drain"] = {
        sf: bench_leased_drain(spark, sf, sf_dir)
        for sf, sf_dir in SFS.items()
    }
    # sf0.1 -> sf1 exponents (10x data => exponent = log10 ratio)
    res["subset_append"]["exponent"] = _exponent(
        res["subset_append"]["sf0.1"]["append_sec"],
        res["subset_append"]["sf1"]["append_sec"],
    )
    res["drop_column_retire"]["drop_exponent"] = _exponent(
        res["drop_column_retire"]["sf0.1"]["drop_sec"],
        res["drop_column_retire"]["sf1"]["drop_sec"],
    )
    res["drop_column_retire"]["retire_exponent"] = _exponent(
        res["drop_column_retire"]["sf0.1"]["retire_compact_sec"],
        res["drop_column_retire"]["sf1"]["retire_compact_sec"],
    )
    res["leased_feed_drain"]["exponent"] = _exponent(
        res["leased_feed_drain"]["sf0.1"]["drain_wall_sec"],
        res["leased_feed_drain"]["sf1"]["drain_wall_sec"],
    )
    print(json.dumps(res, indent=2))
    if os.path.exists(out_json):
        with open(out_json) as fh:
            doc = json.load(fh)
        doc.setdefault("experiments", {}).update(res)
        with open(out_json, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"# merged into {out_json}", file=sys.stderr)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
