"""Round-11 ADVICE regression tests.

- (r10 #1) ``_file_key_disjoint`` bool partition values: the generic
  ``type(ulo)(str)`` cast made ``bool("false")`` read as ``True``, so a
  ``part=false`` file could be falsely proven disjoint from updates
  bounded at ``False`` — a contested rebase would then commit a
  duplicate key, the exact outcome the check exists to prevent.
- (r10 #3) the stream sink's appId-collision guard must not
  ``os.path.abspath`` URI checkpoints: ``abspath('s3a://b/x')``
  prepends the cwd and collapses ``//``, so the SAME stream restarted
  from another cwd/host recorded a different ckpt identity and was
  falsely refused as a collision.
"""

from __future__ import annotations

import os

from etl_opensky_spark.sources.lakesource import _canon_ckpt
from etl_opensky_spark.sources.versioned import (
    _cast_partition_value,
    _file_key_disjoint,
)


class TestBoolPartitionCast:
    def test_false_parses_false(self):
        assert _cast_partition_value("false", True) is False
        assert _cast_partition_value("False", True) is False
        assert _cast_partition_value("true", False) is True

    def test_unparseable_bool_is_unprovable(self):
        assert _cast_partition_value("maybe", True) is None
        assert _cast_partition_value("", False) is None

    def test_non_bool_types_unchanged(self):
        assert _cast_partition_value("7", 0) == 7
        assert _cast_partition_value("2.5", 0.0) == 2.5
        assert _cast_partition_value("x", 0) is None

    def test_false_partition_not_disjoint_from_false_updates(self):
        """The ADVICE scenario end-to-end at the predicate level: a
        winner file under ``flag=false`` versus a merge whose update
        keys are all ``flag=False`` — provably OVERLAPPING, so the
        rebase must NOT be licensed by this column."""
        assert not _file_key_disjoint(
            {}, {"flag": "false"}, ["flag"], {"flag": (False, False)}
        )

    def test_true_partition_disjoint_from_false_updates(self):
        assert _file_key_disjoint(
            {}, {"flag": "true"}, ["flag"], {"flag": (False, False)}
        )

    def test_unparseable_partition_is_unprovable(self):
        assert not _file_key_disjoint(
            {}, {"flag": "maybe"}, ["flag"], {"flag": (False, False)}
        )


class TestCkptCanon:
    def test_uri_checkpoints_untouched(self):
        assert _canon_ckpt("s3a://bucket/ckpt/") == "s3a://bucket/ckpt"
        assert _canon_ckpt("file:/tmp/ckpt") == "file:/tmp/ckpt"
        assert (
            _canon_ckpt("hdfs://nn:8020/app/ckpt")
            == "hdfs://nn:8020/app/ckpt"
        )

    def test_uri_identity_is_cwd_independent(self):
        """The defect: abspath('s3a://b/x') prepends the cwd, so the
        same URI canonicalized from two cwds compared unequal."""
        here = _canon_ckpt("s3a://b/x")
        cwd = os.getcwd()
        try:
            os.chdir("/tmp")
            assert _canon_ckpt("s3a://b/x") == here
        finally:
            os.chdir(cwd)

    def test_local_relative_absolutized(self):
        assert _canon_ckpt("ckpt") == os.path.abspath("ckpt")
        assert _canon_ckpt("/a/b/") == "/a/b"

    def test_none_passthrough(self):
        assert _canon_ckpt(None) is None
        assert _canon_ckpt("") is None
