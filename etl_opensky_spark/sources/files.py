"""File-based scans (SURVEY §2.1: S1-S3, S8).

Schemas are always enforced, never inferred (the reference documents why:
FlightRadar24 JSON emits ``lat: 7`` where float is required,
src/jobs/load_dim_airports.py:27-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1 — read a (possibly hive-partitioned) parquet directory.

    Partition columns are recovered from the directory layout; equality
    filters on them prune directories before any IO
    (reference: src/jobs/extract_flights.py:74).
    """
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """S2 — schema-enforced CSV read
    (reference: src/jobs/load_dim_aircrafts.py:35-59)."""
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def read_json_envelope(
    spark: SparkSession,
    path: str,
    rows_field: str = "rows",
    cast_to: T.StructType | None = None,
) -> DataFrame:
    """S3 — read a JSON envelope ``{"rows": [...]}`` and unwrap to rows.

    Idiomatic replacement for the reference's driver-side WebHDFS
    ``json.load`` + ``createDataFrame``
    (reference: src/jobs/load_dim_airports.py:22-45): the file is read and
    exploded executor-side, so a 100 GB envelope never passes through the
    driver.  ``cast_to`` applies per-column casts after the read (handles
    int-where-float-expected drift instead of driver munging).
    """
    raw = spark.read.json(path, multiLine=True)
    rows = raw.select(F.explode(F.col(rows_field)).alias("_r")).select("_r.*")
    if cast_to is not None:
        rows = rows.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in cast_to.fields
            ]
        )
    return rows


def empty_frame(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """S8 — typed empty DataFrame (reference: src/jobs/extract_flights.py:29)."""
    return spark.createDataFrame([], schema)


def scan_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-binary ingestion for multimodal corpora: Spark's built-in
    ``binaryFile`` source reads each file as one row of
    ``(path, modificationTime, length, content: binary)``.

    This is the on-ramp for image/audio/video blobs into the multimodal
    pipeline (``functions/multimodal.py``): files land as opaque binary +
    typed metadata, feature extraction happens downstream in fused Arrow
    batches.  Scale notes:

    - the listing is distributed (driver lists, executors read), and each
      file is read exactly once by one task — no driver-side ``open()``
      loop;
    - ``pathGlobFilter`` prunes at listing time, before any IO;
    - ``spark.sql.files.maxPartitionBytes`` packs many small files into
      one task (the small-files problem is handled by the source, not by
      the caller).

    The reference has no binary source (its media never leaves HDFS paths);
    this extends §2.1 for the training-data pipeline.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
