"""Round-11 optimization: scale-adaptive streaming state tuning
(queries._stream_tuning / _stream_state_parts).

The tuning is a pure layout/lifecycle choice — every touched gate's
oracle pins output identity — so these tests cover the helper's own
contract: the byte-derivation rule, the env override, and that the
context manager restores session confs (including on error)."""

from __future__ import annotations

import os

from etl_opensky_spark.queries import _stream_state_parts, _stream_tuning


def _mkfile(tmp_path, name, size):
    p = tmp_path / name
    p.write_bytes(b"\0" * size)
    return str(p)


def test_state_parts_byte_rule(spark, tmp_path):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        tiny = _mkfile(tmp_path, "tiny.parquet", 1024)
        # 1 KB -> byte rule says 1, floor lifts to 4
        assert _stream_state_parts(spark, tiny) == 4
        big = _mkfile(tmp_path, "big.bin", 3 * 64 * 1024 * 1024)
        # 192 MB -> ceil(192/64) = 3 partitions, floor lifts to 4
        assert _stream_state_parts(spark, big) == 4
        # 6x64 MB across two files -> 7 (ceil of sum, above the floor)
        big2 = _mkfile(tmp_path, "big2.bin", 3 * 64 * 1024 * 1024 + 7)
        assert _stream_state_parts(spark, big, big2) == 7
    finally:
        # restore the SAVED value, not a constant (ADVICE r11): the
        # shared session fixture's default must survive this test
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_state_parts_env_override_rejects_garbage(spark, tmp_path):
    import pytest

    tiny = _mkfile(tmp_path, "g.bin", 10)
    os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = "not-a-number"
    try:
        with pytest.raises(ValueError, match="SPARK_GRAFT_STATE_PARTITIONS"):
            _stream_state_parts(spark, tiny)
    finally:
        del os.environ["SPARK_GRAFT_STATE_PARTITIONS"]


def test_state_parts_caps_at_session_parallelism(spark, tmp_path):
    # session fixture runs with 4 shuffle partitions: a huge source
    # must not derive beyond the deployment's configured ceiling
    big = _mkfile(tmp_path, "cap.bin", 16 * 64 * 1024 * 1024)
    assert _stream_state_parts(spark, big) == 4


def test_state_parts_env_override(spark, tmp_path):
    tiny = _mkfile(tmp_path, "t.bin", 10)
    os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = "13"
    try:
        assert _stream_state_parts(spark, tiny) == 13
    finally:
        del os.environ["SPARK_GRAFT_STATE_PARTITIONS"]


def test_stream_tuning_sets_and_restores(spark, tmp_path):
    conf = spark.conf
    before_parts = conf.get("spark.sql.shuffle.partitions")
    before_nd = conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    tiny = _mkfile(tmp_path, "s.bin", 10)
    with _stream_tuning(spark, tiny, no_data=False):
        assert conf.get("spark.sql.shuffle.partitions") == "4"
        assert (
            conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
    assert conf.get("spark.sql.shuffle.partitions") == before_parts
    assert (
        conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == before_nd
    )


def test_stream_tuning_restores_on_error(spark, tmp_path):
    conf = spark.conf
    before_parts = conf.get("spark.sql.shuffle.partitions")
    tiny = _mkfile(tmp_path, "e.bin", 10)
    try:
        with _stream_tuning(spark, tiny, no_data=False):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert conf.get("spark.sql.shuffle.partitions") == before_parts


def test_stream_tuning_no_paths_leaves_partitions(spark):
    conf = spark.conf
    before = conf.get("spark.sql.shuffle.partitions")
    with _stream_tuning(spark, no_data=False):
        # no paths -> partitions untouched, only the no-data flag moves
        assert conf.get("spark.sql.shuffle.partitions") == before
        assert (
            conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
    assert conf.get("spark.sql.shuffle.partitions") == before
