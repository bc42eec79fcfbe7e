"""WebDataset tar-shard sink + source — the training-data export format.

Large-scale multimodal training jobs don't stream parquet: they stream
POSIX tar shards where each sample is a group of adjacently-stored
files sharing a key (``{key}.txt``, ``{key}.json``, ``{key}.jpg`` …) —
the WebDataset convention (github.com/webdataset/webdataset) consumed
sequentially by dataloaders at wire speed.  This module is the bridge
out of (and back into) the engine:

- ``write_webdataset``: deterministic hash sharding
  (``pmod(xxhash64(key), shards)`` — the same engine-stable hash every
  sampling op here uses), samples sorted by key INSIDE each shard (so a
  shard's bytes are a pure function of the data: task retries and
  re-runs produce identical tars), one tar per shard written via
  ``mapPartitions`` + stdlib ``tarfile`` with write-to-temp + atomic
  rename (a retried task can never leave a torn shard);
- ``read_webdataset``: ``binaryFile`` scan of the shards +
  ``mapInPandas`` tar parse — one Python pass per shard, Arrow-batched,
  emitting ``(key, field, content)`` rows for relational reassembly.

Scale shape: shard COUNT is the parallelism knob (shards ≫ executors at
100 TB); nothing aggregates globally — the only shuffle is the
repartition onto shards.  Binary columns pass through byte-exact;
strings are UTF-8; everything else is JSON text.  The q287 gate
round-trips the documents table and hash-matches a content checksum per
language against DuckDB on the ORIGINAL table — tar in, tar out, no
information lost.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_opensky_spark.sources.fs import get_fs


def _entry_bytes(value, dtype: str) -> bytes:
    if value is None:
        return b""
    if dtype == "binary":
        return bytes(value)
    if dtype == "string":
        return value.encode("utf-8")
    return json.dumps(value).encode("utf-8")


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    shards: int = 8,
    prefix: str = "shard",
) -> list[str]:
    """Write ``df`` as ``shards`` tar files; every row becomes one
    sample: entries ``{key}.{column}`` for each non-key column.  Keys
    must be distinct (duplicate keys would silently interleave sample
    files — rejected).  Returns the shard paths.  Null keys rejected;
    null values become empty entries (the WebDataset convention for
    optional fields is entry absence — empties keep reassembly
    relational, documented trade)."""
    os.makedirs(path, exist_ok=True)
    dtypes = dict(df.dtypes)
    cols = [c for c in df.columns if c != key_col]
    n = df.count()
    nk = df.filter(F.col(key_col).isNotNull()).select(key_col).distinct().count()
    if nk != n:
        raise ValueError(
            f"write_webdataset: {key_col} must be distinct and non-null "
            f"({n} rows, {nk} usable keys)"
        )
    width = max(6, len(str(shards)))
    shard_of = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
    routed = (
        df.withColumn("_shard", shard_of)
        .repartition(shards, "_shard")
        .sortWithinPartitions("_shard", key_col)
    )

    def _write(rows):
        writers: dict[int, tuple[str, str, tarfile.TarFile, int]] = {}
        for row in rows:
            shard = row["_shard"]
            if shard not in writers:
                final = os.path.join(
                    path, f"{prefix}-{str(shard).zfill(width)}.tar"
                )
                tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
                writers[shard] = (tmp, final, tarfile.open(tmp, "w"), 0)
            tmp, final, tf, cnt = writers[shard]
            key = str(row[key_col])
            for c in cols:
                payload = _entry_bytes(row[c], dtypes[c])
                info = tarfile.TarInfo(name=f"{key}.{c}")
                info.size = len(payload)
                info.mtime = 0  # deterministic bytes
                tf.addfile(info, io.BytesIO(payload))
            writers[shard] = (tmp, final, tf, cnt + 1)
        for shard, (tmp, final, tf, cnt) in writers.items():
            tf.close()
            # atomic publish: retries can't tear a shard (fs seam —
            # resolved INSIDE the task, so executors get the default
            # local backend; an object-store backend writes the final
            # key directly)
            get_fs().replace(tmp, final)
            yield (shard, final, cnt)

    spark = df.sparkSession
    written = spark.createDataFrame(
        routed.rdd.mapPartitions(_write),
        "shard long, shard_path string, n_samples long",
    ).collect()
    return sorted(r["shard_path"] for r in written)


READ_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.tar`` shards and emit ``(key, field, content)`` — one
    row per sample file, bytes untouched.  One Arrow-batched Python
    pass per shard; shard files parallelize the scan."""
    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select("content")

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {"key": [], "field": [], "content": []}
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for member in tf:
                        if not member.isfile():
                            continue
                        key, _, field = member.name.rpartition(".")
                        fh = tf.extractfile(member)
                        out["key"].append(key)
                        out["field"].append(field)
                        out["content"].append(fh.read() if fh else b"")
            yield pd.DataFrame(out)

    return bins.mapInPandas(_parse, schema=READ_SCHEMA)


def reassemble_strings(
    wds: DataFrame, fields: Sequence[str], key_col: str = "key"
) -> DataFrame:
    """Pivot string-typed sample files back into columns: ``(key,
    field1, field2, …)``.  One shuffle on the sample key."""
    pivoted = (
        wds.filter(F.col("field").isin(*fields))
        .groupBy("key")
        .pivot("field", list(fields))
        .agg(F.first(F.col("content").cast("string")))
    )
    return pivoted.withColumnRenamed("key", key_col)


# --- Spark 4 Python Data Source API ----------------------------------------
#
# The idiomatic Spark-4 surface for the same shards:
# ``spark.dataSource.register(WebDatasetDataSource)`` then
# ``spark.read.format("webdataset").load(dir)``.  Differences from
# ``read_webdataset`` (binaryFile + mapInPandas), and why both exist:
#
# - SPLIT-LEVEL PARALLELISM: one ``InputPartition`` per tar shard, so a
#   1000-shard export fans out to 1000 tasks regardless of how
#   binaryFile would coalesce blobs into partitions — and each task
#   STREAMS its tar (stdlib tarfile over the file handle) instead of
#   materializing the whole blob as a row first, so peak memory is one
#   sample, not one shard.
# - PROVENANCE: emits ``shard_path`` per row (lineage/debugging; the
#   mapInPandas reader deliberately drops it).
# - Shard discovery happens ON THE DRIVER and file opens ON EXECUTORS:
#   like the sink, paths must be a shared filesystem (the fs-seam
#   contract; an object-store backend would list/open via its SDK).


def _wds_rows(shard_path: str):
    with tarfile.open(shard_path) as tf:
        for member in tf:
            if not member.isfile():
                continue
            key, _, field = member.name.rpartition(".")
            fh = tf.extractfile(member)
            yield (shard_path, key, field, fh.read() if fh else b"")


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _WebDatasetShardPartition(InputPartition):
        def __init__(self, shard_path: str):
            self.shard_path = shard_path

    class WebDatasetReader(DataSourceReader):
        def __init__(self, options: dict):
            path = options.get("path")
            if not path:
                raise ValueError(
                    "webdataset: pass the shard directory via .load(dir)"
                )
            self._path = path

        def partitions(self):
            import glob

            shards = sorted(glob.glob(os.path.join(self._path, "*.tar")))
            if not shards:
                raise FileNotFoundError(
                    f"webdataset: no *.tar shards under {self._path}"
                )
            return [_WebDatasetShardPartition(s) for s in shards]

        def read(self, partition):
            yield from _wds_rows(partition.shard_path)

    class WebDatasetDataSource(DataSource):
        """``spark.read.format("webdataset")`` — tar shards as a table
        of ``(shard_path, key, field, content)``."""

        @classmethod
        def name(cls) -> str:
            return "webdataset"

        def schema(self) -> str:
            return (
                "shard_path string, key string, field string, "
                "content binary"
            )

        def reader(self, schema):
            return WebDatasetReader(self.options)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False


def register_webdataset_source(spark: SparkSession) -> None:
    """Register the ``webdataset`` format on this session (idempotent —
    re-registration replaces the same class)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover - pyspark < 4
        raise RuntimeError(
            "webdataset data source requires the pyspark-4 "
            "Python Data Source API"
        )
    spark.dataSource.register(WebDatasetDataSource)
