"""Round-4 batch-11: versioned time travel, keyed purge, snapshot
isolation properties."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


def test_versioned_write_read_history(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        read_version,
        table_history,
        write_version,
    )

    base = str(tmp_path / "tbl")
    v1 = write_version(spark.range(3), base)
    v2 = write_version(spark.range(10), base)
    assert (v1, v2) == (1, 2)
    assert table_history(base) == [1, 2]
    assert read_version(spark, base).count() == 10  # current = v2
    assert read_version(spark, base, as_of=1).count() == 3
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, base, as_of=5)


def test_versioned_snapshot_pinned_across_commits(spark, tmp_path):
    """A reader resolved before a new commit must keep seeing its
    snapshot (snapshot isolation)."""
    from etl_opensky_spark.sources.versioned import (
        read_version,
        write_version,
    )

    base = str(tmp_path / "tbl")
    write_version(spark.range(5), base)
    snap = read_version(spark, base)  # pinned to v1's directory
    write_version(spark.range(100), base)
    assert snap.count() == 5
    assert read_version(spark, base).count() == 100


def test_versioned_torn_manifest_never_observed(spark, tmp_path):
    """An orphan data directory without a commit file is invisible
    (protocol now commit-log-based — see tests/test_versioned_lake.py
    for the full crash-injection suite)."""
    from etl_opensky_spark.sources.versioned import (
        read_version,
        table_history,
        write_version,
    )

    base = str(tmp_path / "tbl")
    write_version(spark.range(4), base)
    # simulate a crash after data write, before the commit-file create
    spark.range(999).write.parquet(os.path.join(base, "data-orphan"))
    assert read_version(spark, base).count() == 4
    assert table_history(base) == [1]


def test_purge_deletes_only_matched_keys_and_reports_count(spark, tmp_path):
    from etl_opensky_spark.sources.sinks import purge_parquet_keyed

    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"p{i % 3}", i * 10) for i in range(30)], ["k", "part", "v"]
    )
    df.write.partitionBy("part").parquet(base)
    dk = spark.createDataFrame([(i,) for i in range(0, 30, 5)], ["k"])
    n = purge_parquet_keyed(spark, base, dk, ["k"], partition_by=["part"])
    assert n == 6
    left = spark.read.parquet(base)
    assert left.count() == 24
    assert left.filter(F.col("k") % 5 == 0).count() == 0
    # untouched rows intact, values preserved
    assert rows(left.filter(F.col("k") == 1).select("v")) == [(10,)]


def test_purge_untouched_partitions_not_rewritten(spark, tmp_path):
    """Copy-on-write must leave unaffected partition directories'
    files byte-identical (mtimes/inode paths unchanged)."""
    from etl_opensky_spark.sources.sinks import purge_parquet_keyed

    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", i) for i in range(20)],
        ["k", "part", "v"],
    )
    df.write.partitionBy("part").parquet(base)

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                fp = os.path.join(root, n)
                out[fp] = os.stat(fp).st_mtime_ns
        return out

    before = files(os.path.join(base, "part=b"))
    dk = spark.createDataFrame([(3,)], ["k"])  # lives in part=a only
    assert purge_parquet_keyed(spark, base, dk, ["k"], ["part"]) == 1
    assert files(os.path.join(base, "part=b")) == before


def test_purge_no_match_is_noop(spark, tmp_path):
    from etl_opensky_spark.sources.sinks import purge_parquet_keyed

    base = str(tmp_path / "lake")
    spark.createDataFrame([(1, "x")], ["k", "v"]).write.parquet(base)
    dk = spark.createDataFrame([(99,)], ["k"])
    assert purge_parquet_keyed(spark, base, dk, ["k"]) == 0
    assert spark.read.parquet(base).count() == 1


# --- incremental view maintenance -------------------------------------------


def test_apply_agg_delta_matches_recompute_with_group_moves(spark):
    from etl_opensky_spark.operators.aggregates import apply_agg_delta

    base = [(i, "g%d" % (i % 3), i * 10) for i in range(30)]
    state = (
        spark.createDataFrame(base, ["k", "g", "v"])
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("v").cast("bigint").alias("total"),
        )
    )
    # delete k=0..4, update k=10 (value +5, group g1->g0), insert k=100
    changelog = spark.createDataFrame(
        [("D", "g%d" % (k % 3), k * 10, None, None) for k in range(5)]
        + [("U", "g1", 100, "g0", 105)]
        + [("I", None, None, "g2", 1000)],
        "op string, old_group string, old_val long, new_group string, new_val long",
    )
    got = dict(
        (r.g, (r.cnt, r.total))
        for r in apply_agg_delta(state, changelog).collect()
    )
    final = (
        [(k, "g%d" % (k % 3), k * 10) for k in range(5, 30) if k != 10]
        + [(10, "g0", 105), (100, "g2", 1000)]
    )
    want = {}
    for _, g, v in final:
        c, s = want.get(g, (0, 0))
        want[g] = (c + 1, s + v)
    assert got == want


def test_apply_agg_delta_drops_emptied_groups(spark):
    from etl_opensky_spark.operators.aggregates import apply_agg_delta

    state = spark.createDataFrame(
        [("a", 1, 7), ("b", 2, 10)], "g string, cnt long, total long"
    )
    changelog = spark.createDataFrame(
        [("D", "a", 7, None, None)],
        "op string, old_group string, old_val long, new_group string, new_val long",
    )
    got = rows(apply_agg_delta(state, changelog))
    assert got == [("b", 2, 10)]


# --- partial salted join -----------------------------------------------------


def test_partial_salted_join_equals_plain_join(spark):
    from etl_opensky_spark.operators.joins import partial_salted_join

    big = spark.createDataFrame(
        [(1 if i % 10 < 8 else i % 50, i) for i in range(2000)], ["k", "v"]
    )
    small = spark.createDataFrame([(k, f"d{k}") for k in range(50)], ["sk", "d"])
    got = rows(
        partial_salted_join(big, small, "k", "sk", salt_buckets=4)
        .select("k", "v", "d")
    )
    want = rows(
        big.join(small, big["k"] == small["sk"]).select("k", "v", "d")
    )
    assert got == want


def test_partial_salted_join_salts_only_hot_keys(spark):
    """The hot key's rows spread across salt buckets; the small side is
    replicated ONLY for hot keys (cold replication would multiply the
    plan's small-side row count)."""
    from etl_opensky_spark.operators.joins import partial_salted_join

    big = spark.createDataFrame(
        [(1 if i % 2 == 0 else i % 100, i) for i in range(2000)], ["k", "v"]
    )
    small = spark.createDataFrame(
        [(k, f"d{k}") for k in range(100)], ["sk", "d"]
    )
    out = partial_salted_join(big, small, "k", "sk", salt_buckets=4)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # hot branch present (salted union with cold branch)
    assert "Union" in plan
    # and results still correct
    assert out.count() == big.join(small, big["k"] == small["sk"]).count()


def test_partial_salted_join_no_hot_keys_is_plain(spark):
    from etl_opensky_spark.operators.joins import partial_salted_join

    big = spark.createDataFrame([(i % 100, i) for i in range(1000)], ["k", "v"])
    small = spark.createDataFrame([(k, k) for k in range(100)], ["sk", "d"])
    out = partial_salted_join(
        big, small, "k", "sk", salt_buckets=4, hot_share_pct=5.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan  # uniform keys -> single plain join
    assert out.count() == 1000


def test_partial_salted_left_join_preserves_null_and_unmatched(spark):
    from etl_opensky_spark.operators.joins import partial_salted_join

    big = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (None, 4), (99, 5)],
        "k int, v int",
    )
    small = spark.createDataFrame([(1, "one")], ["sk", "d"])
    out = partial_salted_join(
        big, small, "k", "sk", how="left", salt_buckets=2,
        hot_share_pct=10.0,
    )
    got = rows(out.select("v", "d"))
    assert got == [(1, "one"), (2, "one"), (3, "one"), (4, None), (5, None)]


# --- Spark 4 surfaces: variant, recursive CTE, UDTF, TWS ---------------------


def test_recursive_cte_runs_in_spark(spark):
    got = spark.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t "
        "WHERE n < 10) SELECT CAST(SUM(n) AS BIGINT) AS s FROM t"
    ).collect()
    assert got[0].s == 55


def test_variant_get_typed_extraction(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": "x"}}',), ('{"a": 7}',), ("{}",)], ["j"]
    )
    out = df.select(
        F.expr("variant_get(parse_json(j), '$.a', 'int')").alias("a"),
        F.expr("variant_get(parse_json(j), '$.b.c', 'string')").alias("c"),
    ).collect()
    assert [(r.a, r.c) for r in out] == [(1, "x"), (7, None), (None, None)]


def test_tws_running_totals_or_env_blocked(spark, tmp_path):
    """transformWithStateInPandas needs a protobuf RUNTIME (pyspark's
    generated StateMessage_pb2 pins >= 6.33); this container has none —
    not even a pure-Python one — and installs are prohibited, so the
    operator is env-gated (root-cause investigation recorded in
    docs/NOTES_r5.md: the pure-python-implementation env var selects an
    implementation inside an installed package, it cannot replace the
    package).  When the env supports it, the operator must match the
    batch aggregate."""
    pytest.importorskip("google.protobuf.descriptor")
    from etl_opensky_spark.streaming.stateful import running_totals_tws

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "user_id long, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    totals = running_totals_tws(stream)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n, r.total)
        for r in spark.sql(
            "SELECT user_id, max(n) AS n, max_by(total, n) AS total "
            "FROM tws_test GROUP BY user_id"
        ).collect()
    }
    assert got == {1: (2, 15.0), 2: (1, 7.0)}


# --- plan linting ------------------------------------------------------------


def test_plan_warnings_flags_cartesian_and_single_partition(spark):
    from etl_opensky_spark.plans.lint import plan_warnings

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cross = a.crossJoin(b)
    assert any("cartesian" in w or "nested-loop" in w
               for w in plan_warnings(cross))

    from pyspark.sql import Window
    global_rank = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert any(
        "single-partition" in w for w in plan_warnings(global_rank)
    )


def test_plan_warnings_flags_row_udf_but_not_arrow(spark):
    from pyspark.sql.functions import pandas_udf, udf

    from etl_opensky_spark.plans.lint import plan_warnings

    df = spark.range(50).select(F.col("id").cast("double").alias("x"))
    slow = df.select(udf(lambda v: v + 1, "double")("x").alias("y"))
    assert any("python-row-udf" in w for w in plan_warnings(slow))

    fast = pandas_udf(lambda v: v + 1, "double")  # Arrow-batched
    assert not any(
        "python-row-udf" in w for w in plan_warnings(df.select(fast("x")))
    )


def test_plan_warnings_clean_on_good_plan(spark):
    from etl_opensky_spark.plans.lint import plan_warnings

    df = (
        spark.range(1000)
        .select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    assert plan_warnings(df) == []


# --- bad-record quarantine ---------------------------------------------------


def test_jsonl_quarantine_routes_without_dropping(spark, tmp_path):
    from etl_opensky_spark.sources.files import read_jsonl_with_quarantine

    p = str(tmp_path / "in")
    lines = ['{"k": 1}', '{"k": 2}', "{broken", '{"k": null}', "not json"]
    spark.createDataFrame([(l,) for l in lines], ["value"]).coalesce(
        1
    ).write.text(p)
    good, bad = read_jsonl_with_quarantine(spark, p, "k INT")
    assert good.count() == 3  # includes the VALID null row
    assert sorted(r.raw_line for r in bad.collect()) == ["not json", "{broken"]
    # a valid row whose field is null must NOT be quarantined (the
    # PERMISSIVE all-null trap)
    assert good.filter(F.col("k").isNull()).count() == 1


# --- evaluation metrics ------------------------------------------------------


def test_exact_auc_known_cases(spark):
    from etl_opensky_spark.functions.evaluation import exact_auc

    # perfect separation -> AUC 1; reversed -> 0; with a tie -> 0.5 rank
    perf = spark.createDataFrame(
        [(10, True), (9, True), (2, False), (1, False)], ["s", "p"]
    )
    r = exact_auc(perf, "s", "p").collect()[0]
    assert (r.auc_num, r.auc_den, r.auc) == (8, 8, 1.0)

    rev = spark.createDataFrame(
        [(1, True), (2, True), (9, False), (10, False)], ["s", "p"]
    )
    assert exact_auc(rev, "s", "p").collect()[0].auc == 0.0

    # one positive and one negative tied at the same score -> AUC 0.5
    tie = spark.createDataFrame([(5, True), (5, False)], ["s", "p"])
    assert exact_auc(tie, "s", "p").collect()[0].auc == 0.5


def test_exact_auc_matches_sklearn_formula_on_random(spark):
    import numpy as np

    from etl_opensky_spark.functions.evaluation import exact_auc

    rng = np.random.default_rng(5)
    scores = rng.integers(0, 20, size=200)  # heavy ties
    labels = rng.integers(0, 2, size=200).astype(bool)
    df = spark.createDataFrame(
        [(int(s), bool(p)) for s, p in zip(scores, labels)], ["s", "p"]
    )
    got = exact_auc(df, "s", "p").collect()[0]
    # reference: rank-based AUC with average ranks (scipy-free)
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and sorted_scores[j] == sorted_scores[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    p = labels.sum()
    n = len(labels) - p
    want = (ranks[labels].sum() - p * (p + 1) / 2) / (p * n)
    assert got.auc == pytest.approx(want, abs=1e-6)


def test_ndcg_perfect_and_inverted(spark):
    from etl_opensky_spark.functions.evaluation import ndcg_at_k

    # ranking by 'order' equals ranking by relevance -> NDCG 1
    rows_in = [("q1", i, 100 - i, 100 - i) for i in range(20)]
    df = spark.createDataFrame(rows_in, ["q", "id", "o", "rel"])
    r = ndcg_at_k(df, "q", "o", "id", "rel", k=10).collect()[0]
    assert r.ndcg == 1.0 and r.dcg_micros == r.idcg_micros

    # inverted ranking -> NDCG < 1 (graded tail still carries credit)
    inv = spark.createDataFrame(
        [("q1", i, i, 100 - i) for i in range(20)], ["q", "id", "o", "rel"]
    )
    assert ndcg_at_k(inv, "q", "o", "id", "rel", k=10).collect()[0].ndcg < 1.0

    # binary relevance with the ONLY relevant item ranked outside top-10
    # -> DCG@10 is zero
    binary = spark.createDataFrame(
        [("q1", i, 100 - i, 1 if i == 19 else 0) for i in range(20)],
        ["q", "id", "o", "rel"],
    )
    r2 = ndcg_at_k(binary, "q", "o", "id", "rel", k=10).collect()[0]
    assert r2.dcg_micros == 0 and r2.ndcg == 0.0
