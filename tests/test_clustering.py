"""k-means (functions/clustering.py): correctness properties + the
plan shapes that make it scale (shuffle-free assignment, single-shuffle
update)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_opensky_spark.functions.clustering import (
    QUANT_SCALE,
    _assign,
    _quantize,
    kmeans,
    kmeans_summary,
)


def _toy(spark):
    # two tight blobs around (0,0) and (10,10): k=2 must separate them
    pts = [
        (1, [0.0, 0.1]), (2, [0.1, 0.0]), (3, [0.05, 0.05]),
        (4, [10.0, 10.1]), (5, [10.1, 10.0]), (6, [9.95, 10.05]),
    ]
    return spark.createDataFrame(pts, "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs(spark):
    out = kmeans(_toy(spark), k=2, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.vec_id)
    assert sorted(map(sorted, by_cluster.values())) == [[1, 2, 3], [4, 5, 6]]


def test_kmeans_distortion_non_increasing(spark):
    emb = _toy(spark)
    totals = []
    for iters in (0, 1, 2, 3):
        rows = kmeans_summary(emb, k=2, iters=iters).collect()
        totals.append(sum(r.total_sq_dist for r in rows))
    assert totals == sorted(totals, reverse=True) or len(set(totals)) == 1


def test_kmeans_deterministic(spark):
    emb = _toy(spark)
    a = sorted(tuple(r) for r in kmeans(emb, k=2, iters=2).collect())
    b = sorted(tuple(r) for r in kmeans(emb, k=2, iters=2).collect())
    assert a == b


def test_assignment_tie_breaks_to_lowest_centroid_id(spark):
    vq_df = spark.createDataFrame(
        [(1, [0, 0])], "vec_id long, _vq array<bigint>"
    )
    # both centroids equidistant: slot 1 (cid 7 listed first) must win
    out = _assign(vq_df, [(7, [2, 0]), (3, [0, 2])]).collect()[0]
    assert out["_cid"] == 7 and out["_dist"] == 4


def test_assignment_plan_has_no_exchange(spark):
    """Assignment must be a narrow map over the data — centroids are
    literals, so no join, no shuffle."""
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    vq_df = emb.select("vec_id", _quantize(emb, "embedding").alias("_vq"))
    plan = _assign(
        vq_df, [(1, [0, 0]), (2, [QUANT_SCALE, 0])]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_matches_single_node_reference(spark):
    """Cross-check the distributed path against a plain-Python Lloyd
    run with the same quantization and tie rules."""
    import math

    pts = [(i, [((i * 37) % 11) / 3.0, ((i * 53) % 7) / 2.0]) for i in range(30)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    k, iters = 3, 2

    vq = {
        i: [round(float(f"{x:.9g}") * QUANT_SCALE) for x in v] for i, v in pts
    }
    # python floats of float32 values: mimic Spark's float->double widen
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vq = {i: [round(f32(x) * QUANT_SCALE) for x in v] for i, v in pts}
    cents = {c + 1: vq[sorted(vq)[c]] for c in range(k)}

    def assign():
        out = {}
        for i, v in vq.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cq)), cid)
                for cid, cq in cents.items()
            )
            out[i] = best
        return out

    for _ in range(iters):
        a = assign()
        new = {}
        for i, (d, cid) in a.items():
            new.setdefault(cid, []).append(vq[i])
        cents = {
            cid: [
                math.floor(sum(col) / len(vs)) for col in zip(*vs)
            ]
            for cid, vs in new.items()
        }
    expected = {i: cid for i, (d, cid) in assign().items()}

    got = {r.vec_id: r.cluster_id for r in kmeans(emb, k=k, iters=iters).collect()}
    assert got == expected


def test_semdedup_drops_near_duplicates_keeps_lowest_id(spark):
    from etl_opensky_spark.functions.clustering import semdedup

    pts = [
        (1, [1.0, 0.0]), (2, [0.999, 0.001]),   # near-dups: 2 dropped
        (3, [0.0, 1.0]),                          # distinct direction
        (10, [10.0, 10.0]), (11, [10.01, 10.0]),  # far blob near-dups
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = {r.cluster_id: (r.n_members, r.n_kept)
           for r in semdedup(emb, k=2, iters=2, threshold_bp=9900).collect()}
    assert sum(m for m, _ in out.values()) == 5
    assert sum(kp for _, kp in out.values()) == 3  # one drop per dup pair


def test_semdedup_threshold_zero_keeps_only_first_per_direction(spark):
    from etl_opensky_spark.functions.clustering import semdedup

    # orthogonal vectors: dot = 0 -> cos = 0 >= 0.0 threshold -> all but
    # the lowest id drop within the cluster
    pts = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = semdedup(emb, k=1, iters=1, threshold_bp=0).collect()
    assert [(r.n_members, r.n_kept) for r in out] == [(3, 1)]


def test_kmeans_invariant_under_repartitioning(spark):
    from etl_opensky_spark.functions.clustering import kmeans

    pts = [(i, [((i * 37) % 11) / 3.0, ((i * 53) % 7) / 2.0]) for i in range(40)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    base = sorted(tuple(r) for r in kmeans(emb, k=3, iters=2).collect())
    for parts in (1, 3, 13):
        shuffled = emb.repartition(parts)
        got = sorted(tuple(r) for r in kmeans(shuffled, k=3, iters=2).collect())
        assert got == base, f"partitioning {parts} changed the result"


def test_kmeans_seed_collect_fused_into_first_round(spark):
    """The centroid seeds must not cost a dedicated driver collect: the
    seed array rides executor-side into the round-1 update, and the
    checkpoint materializes lazily inside the first scheduled job.
    Pinned: <= 2 scheduler jobs per Lloyd round + 1 final collect, and
    NO dedicated localCheckpoint or seed-collect job (was 7 jobs for
    iters=2 with the eager checkpoint + separate seed collect; now 6)."""
    pts = [(i, [((i * 37) % 11) / 3.0, ((i * 53) % 7) / 2.0]) for i in range(40)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    sc = spark.sparkContext
    group = "kmeans-job-count"
    sc.setJobGroup(group, "pin kmeans job count")
    try:
        rows = kmeans(emb, k=3, iters=2).collect()
    finally:
        sc.setJobGroup(None, None)
    assert len(rows) == 40
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    assert len(jobs) <= 6, f"expected <= 6 jobs for iters=2, got {len(jobs)}"
    for j in jobs:
        for s in list(st.getJobInfo(j).stageIds):
            info = st.getStageInfo(s)
            if info is not None:
                assert "localCheckpoint" not in info.name


def test_semdedup_invariant_under_repartitioning(spark):
    from etl_opensky_spark.functions.clustering import semdedup

    pts = [(i, [((i * 19) % 13) / 4.0, ((i * 31) % 5) / 2.0]) for i in range(40)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    base = sorted(tuple(r) for r in semdedup(emb, k=3, iters=1).collect())
    got = sorted(
        tuple(r) for r in semdedup(emb.repartition(7), k=3, iters=1).collect()
    )
    assert got == base
