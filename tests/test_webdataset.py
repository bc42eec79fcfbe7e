"""WebDataset tar-shard sink + source (sources/webdataset.py)."""

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.webdataset import (
    read_webdataset,
    reassemble_strings,
    write_webdataset,
)


@pytest.fixture()
def sample(spark):
    rows = [
        (i, f"text {i}", bytes([i % 256, 255 - i % 256]), {"n": i})
        for i in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t, b, __import__("json").dumps(m)) for i, t, b, m in rows],
        "doc_id long, txt string, payload binary, meta string",
    )
    return df


def test_roundtrip_byte_exact(spark, sample, tmp_path):
    out = str(tmp_path / "wds")
    paths = write_webdataset(sample, out, "doc_id", shards=4)
    assert len(paths) >= 1 and all(p.endswith(".tar") for p in paths)
    back = read_webdataset(spark, out)
    assert back.count() == 50 * 3  # 3 fields per sample
    # binary payloads byte-exact
    got = {
        int(r["key"]): bytes(r["content"])
        for r in back.filter(F.col("field") == "payload").collect()
    }
    assert got[7] == bytes([7, 248])
    txt = reassemble_strings(back, ["txt", "meta"], key_col="doc_id")
    row = txt.filter(F.col("doc_id") == "13").collect()[0]
    assert row["txt"] == "text 13"
    assert __import__("json").loads(row["meta"]) == {"n": 13}


def test_shards_are_deterministic_bytes(spark, sample, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_webdataset(sample, a, "doc_id", shards=3)
    write_webdataset(sample.repartition(11), b, "doc_id", shards=3)
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name


def test_samples_are_contiguous_in_shard(spark, sample, tmp_path):
    out = str(tmp_path / "wds")
    paths = write_webdataset(sample, out, "doc_id", shards=2)
    for p in paths:
        with tarfile.open(p) as tf:
            names = [m.name for m in tf if m.isfile()]
        keys = [n.rpartition(".")[0] for n in names]
        # every sample's files adjacent, samples sorted by key
        seen = []
        for k in keys:
            if not seen or seen[-1] != k:
                seen.append(k)
        assert len(set(seen)) == len(seen)
        assert seen == sorted(seen, key=lambda s: int(s) if s.isdigit() else s)


def test_duplicate_or_null_keys_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b")], "doc_id long, txt string"
    )
    with pytest.raises(ValueError, match="distinct"):
        write_webdataset(df, str(tmp_path / "x"), "doc_id")
    df2 = spark.createDataFrame(
        [(None, "a"), (2, "b")], "doc_id long, txt string"
    )
    with pytest.raises(ValueError, match="distinct"):
        write_webdataset(df2, str(tmp_path / "y"), "doc_id")


def test_python_datasource_reader_matches_mapinpandas(spark, sample, tmp_path):
    """The Spark-4 Python DataSource reads the same shards with one
    task PER SHARD and byte-identical content to the mapInPandas
    reader, plus shard provenance."""
    from etl_opensky_spark.sources.webdataset import (
        read_webdataset,
        register_webdataset_source,
    )

    out = str(tmp_path / "wds")
    paths = write_webdataset(sample, out, "doc_id", shards=3)
    register_webdataset_source(spark)
    via_ds = spark.read.format("webdataset").load(out)
    # split-level parallelism: one input partition per tar shard
    assert via_ds.rdd.getNumPartitions() == len(paths)
    assert set(
        r["shard_path"] for r in via_ds.select("shard_path").distinct().collect()
    ) == set(paths)
    a = sorted(
        tuple(r) for r in via_ds.select("key", "field", "content").collect()
    )
    b = sorted(tuple(r) for r in read_webdataset(spark, out).collect())
    assert a == b


def test_python_datasource_empty_dir_raises(spark, tmp_path):
    from etl_opensky_spark.sources.webdataset import (
        register_webdataset_source,
    )

    register_webdataset_source(spark)
    empty = str(tmp_path / "none")
    import os

    os.makedirs(empty)
    with pytest.raises(Exception, match="no .*tar shards"):
        spark.read.format("webdataset").load(empty).collect()
