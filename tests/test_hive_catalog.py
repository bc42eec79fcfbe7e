"""Hive-metastore-backed catalog parity (reference warehouse tier).

The reference writes its warehouse through a Hive metastore
(src/jobs/load_fct_flights.py:112-116, format("hive") + dynamic
partition append).  ``spark.sql.catalogImplementation`` is fixed at the
first SparkSession in a JVM, so this test drives a REAL hive-catalog
session in a subprocess (embedded derby metastore in a tmpdir) and
checks the engine's sink surface against it: partitioned dynamic-insert
append, overwrite, SHOW PARTITIONS metadata, and spark.table reads.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import json, os, sys
    d = sys.argv[1]
    os.chdir(d)  # derby writes metastore_db/ + derby.log into cwd
    sys.path.insert(0, sys.argv[2])
    from etl_opensky_spark.session import get_spark
    from etl_opensky_spark.sources.sinks import write_table

    spark = get_spark(
        "hive-parity",
        master="local[2]",
        shuffle_partitions=4,
        warehouse_dir=f"{d}/wh",
        extra_conf={
            "spark.hadoop.javax.jdo.option.ConnectionURL":
                f"jdbc:derby:;databaseName={d}/metastore_db;create=true",
        },
        hive_support=True,
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    day1 = spark.createDataFrame(
        [(1, 20240101), (2, 20240101)], "flight_id long, date_id int"
    )
    day2 = spark.createDataFrame([(3, 20240102)], "flight_id long, date_id int")

    write_table(day1, "fct", mode="overwrite", partition_by=["date_id"])
    write_table(day2, "fct", mode="append", partition_by=["date_id"])
    # dynamic partition overwrite: day1 rewritten, day2 untouched
    day1b = spark.createDataFrame([(9, 20240101)], "flight_id long, date_id int")
    write_table(day1b, "fct", mode="overwrite_partitions", partition_by=["date_id"])

    parts = sorted(r[0] for r in spark.sql("SHOW PARTITIONS fct").collect())
    rows = sorted(
        (r["flight_id"], r["date_id"]) for r in spark.table("fct").collect()
    )
    print("RESULT " + json.dumps({"parts": parts, "rows": rows}))
    """
)


def test_hive_catalog_partitioned_sink_roundtrip(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path), repo],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    ]
    assert result_line, proc.stdout[-2000:]
    got = json.loads(result_line[0][len("RESULT "):])
    assert got["parts"] == ["date_id=20240101", "date_id=20240102"]
    # day1 partition was dynamically overwritten (1,2 -> 9); day2 survived
    assert got["rows"] == [[3, 20240102], [9, 20240101]]


GATE_SCRIPT = textwrap.dedent(
    """
    import json, os, sys
    d = sys.argv[1]
    os.chdir(d)
    sys.path.insert(0, sys.argv[2])
    sf_dir = sys.argv[3]
    from etl_opensky_spark.session import get_spark
    from etl_opensky_spark.queries import _events

    spark = get_spark(
        "hive-gate",
        master="local[2]",
        shuffle_partitions=4,
        warehouse_dir=f"{d}/wh",
        extra_conf={
            "spark.hadoop.javax.jdo.option.ConnectionURL":
                f"jdbc:derby:;databaseName={d}/metastore_db;create=true",
            "spark.hadoop.hive.exec.dynamic.partition": "true",
            "spark.hadoop.hive.exec.dynamic.partition.mode": "nonstrict",
        },
        hive_support=True,
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    # the reference's exact write surface: format("hive"), partitioned,
    # dynamic append into the metastore (load_fct_flights.py:112-116)
    ev = _events(spark, sf_dir)
    (
        ev.write.format("hive")
        .mode("overwrite")
        .partitionBy("event_type")
        .saveAsTable("events_hive")
    )

    # q17's daily aggregation, but read back THROUGH the hive table —
    # values round-trip the hive serde before aggregating
    out = spark.sql(\"\"\"
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events_hive GROUP BY 1, 2
    \"\"\")
    rows = sorted(
        (r["day"].isoformat(), r["event_type"], r["n"],
         r["sum_value"], r["min_value"], r["max_value"])
        for r in out.collect()
    )
    print("RESULT " + json.dumps(rows))
    """
)


def test_hive_format_table_gate_query_matches_duckdb_oracle(tmp_path):
    """Oracle parity THROUGH the hive catalog: events loaded into a real
    ``format("hive")`` partitioned metastore table, the q17 daily
    aggregation computed over ``spark.table``-read hive data, compared
    against DuckDB running the same SQL on the source parquet — the
    reference's warehouse tier (load_fct_flights.py:112-116) verified
    end-to-end, not just its write metadata."""
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", GATE_SCRIPT, str(tmp_path), repo, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    ]
    assert result_line, proc.stdout[-2000:]
    got = [tuple(r) for r in json.loads(result_line[0][len("RESULT "):])]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = sorted(
        (day.isoformat(), et, n, sv, mn, mx)
        for day, et, n, sv, mn, mx in con.execute(
            """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == oracle
