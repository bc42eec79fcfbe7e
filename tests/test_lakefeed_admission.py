"""Size-based admission control + ``startingVersion='latest'`` for the
``lakefeed`` stream source (round 10).

``maxBytesPerBatch`` is the maxBytesPerTrigger analog: commit dirs
vary by orders of magnitude, so the byte budget — not the commit
count — is what bounds executor memory and retry blast radius.  It
composes with ``maxCommitsPerBatch``, always admits at least one
pending commit (an oversized commit must not stall the stream), and
follows the same first-probe-uncapped rule as the count cap.

``startingVersion='latest'`` (Delta parity) starts a FRESH query at
the feed tip; it resolves only in ``initialOffset`` so a checkpointed
restart — which never calls initialOffset — can never have its offset
floored past unpublished versions.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from etl_opensky_spark.sources.lakefeed import (
    LakeFeedStreamReader,
    register_lakefeed_source,
)
from etl_opensky_spark.sources.versioned import (
    materialize_change_feed,
    merge_versioned,
    write_version,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _lake(spark, tmp_path, n=4, rows_per_commit=1):
    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    write_version(_df(spark, []), src)
    k = 0
    for _ in range(n):
        pairs = [(k + j, f"v{k + j}") for j in range(rows_per_commit)]
        k += rows_per_commit
        merge_versioned(spark, src, _df(spark, pairs), ["id"])
    materialize_change_feed(spark, src, feed, ["id"])
    return src, feed


class TestBytesAdmission:
    def test_budget_bounds_batch(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)  # commits 2..5
        r = LakeFeedStreamReader(
            {"path": feed, "maxBytesPerBatch": str(10**9)}
        )
        # first probe of a run: uncapped (offset-log safety rule)
        assert r.latestOffset() == {"version": 5}
        r.partitions({"version": 0}, {"version": 0})  # base := 0
        sizes = {v: r._dir_bytes(v) for v in (2, 3, 4, 5)}
        assert all(s > 0 for s in sizes.values())
        # budget fits exactly the first two pending commits
        r2 = LakeFeedStreamReader(
            {
                "path": feed,
                "maxBytesPerBatch": str(sizes[2] + sizes[3]),
            }
        )
        r2.partitions({"version": 0}, {"version": 0})
        assert r2.latestOffset() == {"version": 3}
        r2.partitions({"version": 0}, {"version": 3})
        # next batch admits from 4 until the budget binds again (4
        # alone if 4+5 overflow the budget, else both)
        nxt = r2.latestOffset()["version"]
        exp = 5 if sizes[4] + sizes[5] <= sizes[2] + sizes[3] else 4
        assert nxt == exp

    def test_oversized_commit_never_stalls(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path, n=2)
        r = LakeFeedStreamReader(
            {"path": feed, "maxBytesPerBatch": "1"}
        )
        r.partitions({"version": 0}, {"version": 0})
        # every commit is over the 1-byte budget: still one per batch
        assert r.latestOffset() == {"version": 2}
        r.partitions({"version": 0}, {"version": 2})
        assert r.latestOffset() == {"version": 3}

    def test_composes_with_count_cap(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)
        r = LakeFeedStreamReader(
            {
                "path": feed,
                "maxBytesPerBatch": str(10**9),
                "maxCommitsPerBatch": "2",
            }
        )
        r.partitions({"version": 0}, {"version": 0})
        assert r.latestOffset() == {"version": 3}  # count cap binds


class TestStartingLatest:
    def test_fresh_query_starts_at_tip(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)  # tip = 5
        r = LakeFeedStreamReader(
            {"path": feed, "startingVersion": "latest"}
        )
        # traced engine order: latestOffset first ('latest' still
        # unresolved — no floor applied), then initialOffset resolves
        assert r.latestOffset() == {"version": 5}
        assert r.initialOffset() == {"version": 5}
        parts = r.partitions({"version": 5}, {"version": 5})
        assert [p.version for p in parts] == [-1]  # empty batch
        # new commits after query start are consumed
        merge_versioned(
            spark, src, _df(spark, [(100, "new")]), ["id"]
        )
        materialize_change_feed(spark, src, feed, ["id"])
        assert r.latestOffset() == {"version": 6}
        parts = r.partitions({"version": 5}, {"version": 6})
        assert [p.version for p in parts] == [6]

    def test_empty_feed_resolves_to_one(self, spark, tmp_path):
        feed = str(tmp_path / "feed-none")
        r = LakeFeedStreamReader(
            {"path": feed, "startingVersion": "latest"}
        )
        assert r.initialOffset() == {"version": 0}

    def test_end_to_end_stream(self, spark, tmp_path):
        register_lakefeed_source(spark)
        src, feed = _lake(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        seen: list[int] = []

        def drain():
            q = (
                spark.readStream.format("lakefeed")
                .option("startingVersion", "latest")
                .load(feed)
                .writeStream.foreachBatch(
                    lambda df, _b: seen.extend(
                        r["id"] for r in df.collect()
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        assert seen == []  # history before the query: skipped
        merge_versioned(spark, src, _df(spark, [(777, "x")]), ["id"])
        materialize_change_feed(spark, src, feed, ["id"])
        drain()
        assert seen == [777]  # only the post-start commit
