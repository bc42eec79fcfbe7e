"""Round-4 batch-10 operators: correlation matrix, chi-squared
independence, rolling distinct via HLL merges, table checksums."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from etl_opensky_spark.functions.linalg import correlation_matrix

    rng = np.random.default_rng(3)
    base = rng.standard_normal((80, 1))
    # col0 random, col1 = col0 + noise (high corr), col2 independent
    mat = np.hstack(
        [base, base + 0.1 * rng.standard_normal((80, 1)),
         rng.standard_normal((80, 1))]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): r.corr for r in correlation_matrix(df).collect()
    }
    q = np.floor(mat.astype(np.float64) * 1e6)
    want = np.corrcoef(q.T)
    for i in range(3):
        assert got[(i, i)] == pytest.approx(1.0, abs=1e-6)
        for j in range(i, 3):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-4)
    assert got[(0, 1)] > 0.95 and abs(got[(0, 2)]) < 0.5


def test_chi2_terms_zero_under_perfect_independence(spark):
    # uniform product distribution -> observed == expected -> term 0
    data = [(x, y) for x in ("a", "b") for y in (1, 2) for _ in range(25)]
    df = spark.createDataFrame(data, ["x", "y"])
    cells = df.groupBy("x", "y").agg(F.count("*").alias("o"))
    rowm = cells.groupBy("x").agg(F.sum("o").alias("r"))
    colm = cells.groupBy("y").agg(F.sum("o").alias("c"))
    total = cells.agg(F.sum("o").alias("n"))
    j = cells.join(rowm, "x").join(colm, "y").crossJoin(total)
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    den = (
        F.col("r").cast("double") * F.col("c").cast("double")
        * F.col("n").cast("double")
    )
    terms = j.select((num * num / den).alias("t")).collect()
    assert all(r.t == 0.0 for r in terms)


def test_rolling_distinct_window_merge_equals_window_recount(spark):
    """The sliding register merge must equal computing registers
    directly over each 7-day window's raw rows (merge == recount)."""
    from etl_opensky_spark.functions.cardinality import hll_registers_by

    day0 = dt.date(2024, 3, 1)
    raw = [
        (day0 + dt.timedelta(days=d), u)
        for d in range(10)
        for u in range(d * 40, d * 40 + 60)  # overlapping user ranges
    ]
    df = spark.createDataFrame(raw, ["day", "user_id"])
    regs = hll_registers_by(df, ["day"], "user_id")

    anchor = day0 + dt.timedelta(days=8)
    window_days = [anchor - dt.timedelta(days=i) for i in range(7)]
    merged = rows(
        regs.filter(F.col("day").isin(window_days))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    recount = rows(
        hll_registers_by(
            df.filter(F.col("day").isin(window_days)).select(
                F.lit(1).alias("g"), "user_id"
            ),
            ["g"],
            "user_id",
        ).select("bucket", "register")
    )
    assert merged == recount


def test_table_checksum_order_insensitive_and_change_sensitive(spark):
    from etl_opensky_spark.queries import q168_table_checksum

    # build a tiny orders table on disk to feed the query
    import tempfile, os

    base = tempfile.mkdtemp(prefix=f"cksum_{os.getuid()}_")
    df = spark.createDataFrame(
        [
            (1, 10, "1-URGENT", dt.date(2024, 1, 5)),
            (2, 20, "2-HIGH", dt.date(2024, 1, 9)),
            (3, 30, "3-MEDIUM", dt.date(2024, 2, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate date",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/orders.parquet")
    a = rows(q168_table_checksum(spark, base))
    # same rows, different physical order/partitioning -> same checksums
    df.orderBy(F.desc("o_orderkey")).repartition(3).write.mode(
        "overwrite"
    ).parquet(f"{base}/orders.parquet")
    assert rows(q168_table_checksum(spark, base)) == a
    # a single-row change flips exactly that month's checksum
    df.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 1, 99).otherwise(F.col("o_custkey")),
    ).write.mode("overwrite").parquet(f"{base}/orders.parquet")
    b = dict((m, (n, c)) for m, n, c in rows(q168_table_checksum(spark, base)))
    a = dict((m, (n, c)) for m, n, c in a)
    assert a["2024-02"] == b["2024-02"]
    assert a["2024-01"] != b["2024-01"]
