"""ANN recall@k vs the exact oracle (VERDICT r5 #3).

The q27/q35/q285 gates prove the approximate indexes are DETERMINISTIC;
this tool measures the other half of the accuracy/cost trade they sell:
retrieval quality.  For a deterministic panel of query vectors drawn
from the corpus it computes exact brute-force cosine top-k, then
recall@k for each index family across its cost knob:

- hyperplane LSH (``similarity.lsh_topk``): probe_hamming 0/1/2 over
  H=12 hyperplanes (candidate fraction ~ sum_{i<=r} C(H,i)/2^H)
- IVF (``ivf.ivf_topk``): n_probe 1/2/4 of 16 trained lists
  (scan fraction ~ n_probe/16)
- PQ ADC (``pq.pq_topk``): m=8 and m=16 subspaces, k=16 codes, raw ADC
  ranking and ADC->exact re-rank of 10x candidates

Usage::

    python tools/ann_recall.py [sf_dir] [k] [n_queries]

Defaults: scaledata/sf1 (20k x 64 embeddings), k=10, 20 queries.
Prints one markdown table + one JSON line; paste the table into
docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_opensky_spark.functions.ivf import (  # noqa: E402
    assign_clusters,
    ivf_topk,
    train_centroids,
)
from etl_opensky_spark.functions.pq import (  # noqa: E402
    pq_encode,
    pq_topk,
    pq_train,
)
from etl_opensky_spark.functions.similarity import (  # noqa: E402
    cosine_topk,
    lsh_topk,
    lsh_topk_tables,
    make_hyperplane_tables,
    make_hyperplanes,
)
from etl_opensky_spark.session import get_spark  # noqa: E402

N_HYPERPLANES = 12
IVF_LISTS = 16
PQ_K = 16


def _ids(df, k):
    return [r[0] for r in df.select("vec_id").limit(k).collect()]


def _clustered(spark, n_families=2000, fam=10, dim=64, sigma=0.05):
    """Synthetic NEAR-DUP regime: ``n_families`` unit base vectors, each
    with ``fam`` jittered copies (cosine ~1/(1+dim*sigma^2) ≈ 0.86
    within a family) — the concentrated-angle distribution LSH is for,
    vs the isotropic sf1 embeddings where the top-10 of a random query
    sit at ~60 degrees and hyperplane collisions are hopeless at any
    table count."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((n_families, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pts = np.repeat(base, fam, axis=0) + sigma * rng.standard_normal(
        (n_families * fam, dim)
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark(app_name="ann_recall", shuffle_partitions=32)
    if sf_dir == "clustered":
        emb = _clustered(spark).localCheckpoint()
    else:
        emb = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
    n, dim = emb.count(), len(emb.first()["embedding"])

    # deterministic query panel spread across the id range
    stride = max(n // n_queries, 1)
    qrows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]

    # shared index builds (one-time costs, reused across every query)
    planes = make_hyperplanes(dim, N_HYPERPLANES)
    lsh_tables = {
        L: make_hyperplane_tables(dim, N_HYPERPLANES, L) for L in (4, 8)
    }
    centroids = train_centroids(emb, k=IVF_LISTS, iterations=3)
    assigned = assign_clusters(emb, centroids).localCheckpoint()
    pq_indexes = {}
    for m, kk in ((8, 16), (16, 16), (16, 64)):
        books = pq_train(emb, dim, m=m, k=kk, iters=2)
        pq_indexes[(m, kk)] = (
            books,
            pq_encode(emb, books, dim).localCheckpoint(),
        )

    variants: dict[str, list[float]] = {}
    for qid, qv in queries:
        truth = set(_ids(cosine_topk(emb, qv, k), k))

        def rec(name, ids):
            variants.setdefault(name, []).append(
                len(truth & set(ids)) / len(truth)
            )

        for r in (0, 1, 2):
            rec(
                f"LSH H={N_HYPERPLANES} 1 table probe<={r}",
                _ids(lsh_topk(emb, qv, planes, k, probe_hamming=r), k),
            )
        for L, tabs in lsh_tables.items():
            rec(
                f"LSH H={N_HYPERPLANES} {L} tables",
                _ids(lsh_topk_tables(emb, qv, tabs, k), k),
            )
        for p in (1, 2, 4, 8):
            rec(
                f"IVF lists={IVF_LISTS} n_probe={p}",
                _ids(ivf_topk(assigned, centroids, qv, k, n_probe=p), k),
            )
        for (m, kk), (books, codes) in pq_indexes.items():
            rec(
                f"PQ m={m} k={kk} ADC",
                _ids(pq_topk(codes, books, qv, topn=k), k),
            )
            # ADC shortlist -> exact re-rank (the production composition)
            cand_ids = _ids(pq_topk(codes, books, qv, topn=10 * k), 10 * k)
            cand = emb.filter(F.col("vec_id").isin(cand_ids))
            rec(
                f"PQ m={m} k={kk} ADC+rerank10x",
                _ids(cosine_topk(cand, qv, k), k),
            )

    print(f"\n| index variant | recall@{k} (mean over {len(queries)} queries) |")
    print("|---|---|")
    means = {}
    for name, vals in variants.items():
        means[name] = sum(vals) / len(vals)
        print(f"| {name} | {means[name]:.3f} |")
    print()
    print(json.dumps({
        "sf_dir": sf_dir, "n": n, "dim": dim, "k": k,
        "n_queries": len(queries), "recall": means,
    }))


if __name__ == "__main__":
    main()
