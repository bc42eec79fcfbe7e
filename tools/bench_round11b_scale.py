"""Scale evidence for the round-11 surface: sf0.1 -> sf1 exponents for
metadata-only TYPE WIDENING, PARTITIONED COPY INTO, and PARTITION
EVOLUTION (``set_partition_spec`` + the mixed-era read).

The 100 TB claims under test:

- ``widen_column_type`` is a metadata commit (adopt + one schema_json
  rewrite; stats carried verbatim): near-flat while the table grows
  10x in rows and files;
- a PARTITIONED ``copy_into`` of a FIXED 10k-row batch onto a
  hive-partitioned table is manifest-bound (staging writes only the
  batch; linking is O(batch files); adoption is O(#files) metadata):
  near-flat in table size;
- ``set_partition_spec`` is a metadata commit: near-flat;
- the MIXED-ERA READ after an evolution is data-bound by design (it
  scans both eras) — recorded honestly alongside, with the per-era
  union's planning overhead visible as the delta against a same-size
  single-era read.

Writes results into BENCH_sf1.json under experiments.{widen_column,
partitioned_copy_into, partition_evolution}.

Usage: python tools/bench_round11b_scale.py [out_json]
  (data dirs fixed: /root/testdata/sf0.1 and scaledata/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_opensky_spark.session import get_spark  # noqa: E402
from etl_opensky_spark.sources.versioned import (  # noqa: E402
    copy_into,
    read_version,
    set_partition_spec,
    widen_column_type,
    write_version,
)

WORK = "/tmp/spark_graft_r11b_scale"
SFS = {"sf0.1": "/root/testdata/sf0.1", "sf1": "scaledata/sf1"}


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").cast("int").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("int").alias("cents"),
        (F.col("o_orderkey") % 8).cast("int").alias("bucket"),
        F.col("o_orderdate").cast("date").alias("d"),
    )


def bench_widen(spark, sf, sf_dir, files_per_sf):
    """Metadata-only widen on a table 10x bigger at sf1 — adopt +
    schema rewrite + stats carry, zero data movement."""
    base = os.path.join(WORK, f"widen_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    orders = _orders(spark, sf_dir)
    n_rows = orders.count()
    write_version(
        orders.repartition(files_per_sf), base, stats_cols=("k", "cents")
    )
    t0 = time.perf_counter()
    widen_column_type(
        spark, base,
        {"k": "bigint", "cents": "bigint", "d": "timestamp_ntz"},
    )
    widen_sec = round(time.perf_counter() - t0, 3)
    # the widened read stays exact (spot check, untimed)
    assert read_version(spark, base).limit(1).collect()
    return {
        "table_rows": n_rows,
        "table_files": files_per_sf,
        "widen_sec": widen_sec,
    }


def bench_partitioned_copy_into(spark, sf, sf_dir, files_per_sf):
    """Fixed 10k-row partition-shaped append onto a hive table 10x
    bigger at sf1 — staging writes only the batch, linking is
    O(batch), adoption is O(#files) metadata."""
    base = os.path.join(WORK, f"pcopy_{sf}")
    land = os.path.join(WORK, f"pcopy_land_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(land, ignore_errors=True)
    orders = _orders(spark, sf_dir)
    n_rows = orders.count()
    write_version(
        orders.repartition(files_per_sf // 8), base,
        partition_by=("bucket",), stats_cols=("k",),
    )
    (
        spark.range(10_000)
        .selectExpr(
            "id + 2000000000 AS k", "CAST(1 AS INT) AS cents",
            "CAST(id % 8 AS INT) AS bucket",
            "DATE'2024-01-01' AS d",
        )
        .coalesce(1)
        .write.parquet(land)
    )
    t0 = time.perf_counter()
    copy_into(spark, base, land, stats_cols=("k",))
    append_sec = round(time.perf_counter() - t0, 3)
    return {
        "table_rows": n_rows,
        "append_rows": 10_000,
        "append_sec": append_sec,
    }


def bench_partition_evolution(spark, sf, sf_dir, files_per_sf):
    """set_partition_spec on the 10x table (metadata commit), a fixed
    new-spec append, and the mixed-era full count (data-bound by
    design, recorded honestly)."""
    base = os.path.join(WORK, f"evolve_{sf}")
    land = os.path.join(WORK, f"evolve_land_{sf}")
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(land, ignore_errors=True)
    orders = _orders(spark, sf_dir)
    n_rows = orders.count()
    write_version(
        orders.repartition(files_per_sf // 8), base,
        partition_by=("bucket",), stats_cols=("k",),
    )
    single_era_count_sec = _count_sec(spark, base)
    t0 = time.perf_counter()
    set_partition_spec(spark, base, ["d"])
    spec_sec = round(time.perf_counter() - t0, 3)
    (
        spark.range(10_000)
        .selectExpr(
            "id + 2000000000 AS k", "CAST(1 AS INT) AS cents",
            "CAST(id % 8 AS INT) AS bucket",
            "DATE'2024-01-01' AS d",
        )
        .coalesce(1)
        .write.parquet(land)
    )
    t0 = time.perf_counter()
    copy_into(spark, base, land, stats_cols=("k",))
    append_sec = round(time.perf_counter() - t0, 3)
    mixed_era_count_sec = _count_sec(spark, base)
    return {
        "table_rows": n_rows,
        "set_spec_sec": spec_sec,
        "new_spec_append_sec": append_sec,
        "single_era_count_sec": single_era_count_sec,
        "mixed_era_count_sec": mixed_era_count_sec,
    }


def _count_sec(spark, base) -> float:
    t0 = time.perf_counter()
    read_version(spark, base).count()
    return round(time.perf_counter() - t0, 3)


def _exponent(v01: float, v1: float) -> float:
    import math

    if v01 <= 0 or v1 <= 0:
        return 0.0
    return round(math.log10(v1 / v01), 2)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
    spark = get_spark("bench_round11b_scale")
    os.makedirs(WORK, exist_ok=True)
    files = {"sf0.1": 32, "sf1": 320}
    res: dict = {}
    for name, fn in (
        ("widen_column", bench_widen),
        ("partitioned_copy_into", bench_partitioned_copy_into),
        ("partition_evolution", bench_partition_evolution),
    ):
        res[name] = {
            sf: fn(spark, sf, sf_dir, files[sf])
            for sf, sf_dir in SFS.items()
        }
    res["widen_column"]["exponent"] = _exponent(
        res["widen_column"]["sf0.1"]["widen_sec"],
        res["widen_column"]["sf1"]["widen_sec"],
    )
    res["partitioned_copy_into"]["exponent"] = _exponent(
        res["partitioned_copy_into"]["sf0.1"]["append_sec"],
        res["partitioned_copy_into"]["sf1"]["append_sec"],
    )
    res["partition_evolution"]["spec_exponent"] = _exponent(
        res["partition_evolution"]["sf0.1"]["set_spec_sec"],
        res["partition_evolution"]["sf1"]["set_spec_sec"],
    )
    res["partition_evolution"]["append_exponent"] = _exponent(
        res["partition_evolution"]["sf0.1"]["new_spec_append_sec"],
        res["partition_evolution"]["sf1"]["new_spec_append_sec"],
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
