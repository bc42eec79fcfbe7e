"""Product quantization (functions/pq.py)."""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.functions.clustering import QUANT_SCALE
from etl_opensky_spark.functions.pq import (
    _subspace_bounds,
    pq_encode,
    pq_topk,
    pq_train,
)


def test_subspace_bounds():
    assert _subspace_bounds(64, 4) == [(1, 16), (17, 16), (33, 16), (49, 16)]
    assert _subspace_bounds(10, 3) == [(1, 3), (4, 3), (7, 4)]  # remainder
    with pytest.raises(ValueError):
        _subspace_bounds(4, 5)


@pytest.fixture()
def emb(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()


def test_encode_shape_and_determinism(spark, emb):
    books = pq_train(emb, 8, m=2, k=4, iters=1)
    assert len(books) == 2 and all(1 <= len(b) <= 4 for b in books)
    c1 = {r["vec_id"]: list(r["codes"])
          for r in pq_encode(emb, books, 8).collect()}
    c2 = {r["vec_id"]: list(r["codes"])
          for r in pq_encode(emb.repartition(7), books, 8).collect()}
    assert c1 == c2  # partitioning-invariant
    assert all(len(v) == 2 for v in c1.values())


def test_adc_equals_exact_on_reconstructed_points(spark, emb):
    # a query EQUAL to a centroid has ADC distance == exact distance to
    # every encoded point's reconstruction; sanity: ADC top-1 of a
    # training point near its own reconstruction includes itself in a
    # small overscan
    books = pq_train(emb, 8, m=2, k=8, iters=2)
    codes = pq_encode(emb, books, 8).localCheckpoint()
    q = emb.filter(F.col("vec_id") == 5).first()["embedding"]
    top = pq_topk(codes, books, list(q), topn=20).collect()
    assert 5 in {r["vec_id"] for r in top}
    # distances are non-negative and sorted
    ds = [r["adc_dist"] for r in top]
    assert ds == sorted(ds) and ds[0] >= 0


def test_recall_with_rerank(spark, emb):
    books = pq_train(emb, 8, m=4, k=8, iters=2)
    codes = pq_encode(emb, books, 8).localCheckpoint()
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    cand = {
        r["vec_id"]
        for r in pq_topk(
            codes.filter(F.col("vec_id") != 0), books, list(q), topn=40
        ).collect()
    }
    qq = [round(x * QUANT_SCALE) for x in q]
    d = F.aggregate(
        F.zip_with(
            "v", F.lit(qq), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vq = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"),
        ).alias("v"),
    )
    truth = [
        r["vec_id"]
        for r in vq.filter(F.col("vec_id") != 0)
        .select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    assert len(cand & set(truth)) >= 4  # 1/3 of the table scanned -> high recall
