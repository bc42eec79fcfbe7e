"""IVF ANN tests + bucketed co-located join plan test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.functions.ivf import assign_clusters, ivf_topk, train_centroids
from etl_opensky_spark.functions.similarity import cosine_topk
from etl_opensky_spark.sources.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    # two well-separated blobs around (10,0) and (0,10), plus the query target
    rows = (
        [(i, [10.0 + (i % 3) * 0.1, float(i % 2) * 0.1]) for i in range(10)]
        + [(100 + i, [float(i % 2) * 0.1, 10.0 + (i % 3) * 0.1]) for i in range(10)]
    )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_train_and_assign_separates_blobs(spark, clustered_vectors):
    centroids = train_centroids(clustered_vectors, k=2, iterations=4)
    assigned = assign_clusters(clustered_vectors, centroids)
    clusters = {
        r["vec_id"]: r["cluster_id"] for r in assigned.collect()
    }
    blob_a = {clusters[i] for i in range(10)}
    blob_b = {clusters[100 + i] for i in range(10)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_ivf_topk_matches_bruteforce_on_probed_blob(spark, clustered_vectors):
    centroids = train_centroids(clustered_vectors, k=2, iterations=4)
    assigned = assign_clusters(clustered_vectors, centroids)
    query = [10.0, 0.0]
    ivf = ivf_topk(assigned, centroids, query, k=5, n_probe=1)
    brute = cosine_topk(clustered_vectors, query, k=5)
    assert [r["vec_id"] for r in ivf.collect()] == [
        r["vec_id"] for r in brute.collect()
    ]  # the right blob contains all true top-5, so 1-probe IVF is exact here


def test_assignment_is_narrow(spark, clustered_vectors):
    centroids = [[10.0, 0.0], [0.0, 10.0]]
    plan = (
        assign_clusters(clustered_vectors, centroids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the same key join WITHOUT an Exchange."""
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed_table(a, "bucketed_a", ["k"], 4, sort_by=["k"])
    write_bucketed_table(b, "bucketed_b", ["k"], 4, sort_by=["k"])
    # force the sort-merge path: tiny test tables would otherwise broadcast
    # (planner then ignores bucketing entirely)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_vectorized_assignment_matches_expression_path(spark, clustered_vectors):
    from etl_opensky_spark.functions.ivf import assign_clusters_vectorized

    centroids = train_centroids(clustered_vectors, k=2, iterations=4)
    expr = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(clustered_vectors, centroids).collect()
    }
    vec = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters_vectorized(clustered_vectors, centroids).collect()
    }
    assert expr == vec


def test_vectorized_assignment_matches_on_real_embeddings(spark):
    from etl_opensky_spark.functions.ivf import assign_clusters_vectorized

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = train_centroids(emb, k=8, iterations=2)
    expr = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, centroids).collect()
    }
    vec = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters_vectorized(emb, centroids).collect()
    }
    assert expr == vec


def test_train_centroids_vectorized_mode_equivalent(spark):
    # both Lloyd assignment paths must train IDENTICAL centroids; also
    # pins the auto-threshold routing
    from etl_opensky_spark.functions import ivf as IVF

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    expr = IVF.train_centroids(emb, k=4, iterations=2, assign_mode="expression")
    vec = IVF.train_centroids(emb, k=4, iterations=2, assign_mode="vectorized")
    assert len(expr) == len(vec) == 4
    for ce, cv in zip(expr, vec):
        assert ce == pytest.approx(cv, rel=1e-12)
    # auto routes through the vectorized path above the threshold
    with pytest.raises(ValueError, match="assign_mode"):
        IVF.train_centroids(emb, k=4, assign_mode="bogus")
    assert IVF.VECTORIZED_ASSIGN_K >= 16
