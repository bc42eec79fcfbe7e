"""Tests for the stateful streaming operator and the grouped-map surface."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_opensky_spark.operators.grouped import grouped_apply
from etl_opensky_spark.streaming.stateful import running_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_running_totals_state_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "events")
    # two files -> maxFilesPerTrigger=1 forces at least two micro-batches,
    # so per-key state must survive batch boundaries
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(1, 100.0), (3, 7.0)], "user_id long, value double"
    ).coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "out")

    def capture(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_totals(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out_dir).collect()
    # final state per key = the row from its last batch
    final = {}
    for r in emitted:
        if r["user_id"] not in final or r["batch_id"] > final[r["user_id"]][2]:
            final[r["user_id"]] = (r["n"], r["total"], r["batch_id"])
    assert final[1][:2] == (3, 115.0)  # accumulated across both files
    assert final[2][:2] == (1, 1.0)
    assert final[3][:2] == (1, 7.0)
    # state genuinely crossed a batch boundary: user 1's totals grew
    user1_rows = sorted(
        ((r["batch_id"], r["n"], r["total"]) for r in emitted if r["user_id"] == 1)
    )
    assert len(user1_rows) >= 2 and user1_rows[0][1] < user1_rows[-1][1]


def test_grouped_apply_per_group_fit(spark):
    # per-group least-squares slope — a genuinely pandas/numpy-flavored op
    df = spark.createDataFrame(
        [("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
         ("b", 0.0, 0.0), ("b", 1.0, -1.0)],
        "g string, x double, y double",
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        slope = np.polyfit(pdf["x"], pdf["y"], 1)[0]
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "slope": [float(slope)]})

    out = grouped_apply(df, ["g"], fit, "g string, slope double")
    got = {r["g"]: round(r["slope"], 6) for r in out.collect()}
    assert got == {"a": 2.0, "b": -1.0}
