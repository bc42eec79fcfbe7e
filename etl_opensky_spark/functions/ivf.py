"""IVF (inverted-file) approximate nearest neighbor — the bucketed scale
path for similarity search.

Pipeline: train centroids (Lloyd iterations on a sample, all DataFrame
ops) -> assign every vector to its nearest centroid (``cluster_id``
column; write partitioned/bucketed by it at corpus scale) -> query probes
only the ``n_probe`` nearest clusters and re-ranks exactly inside them.

Everything is JVM array expressions; centroids travel as literal arrays
(they are k×dim floats — tiny), so assignment is a narrow map with no
shuffle and no broadcast state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.similarity import cosine_topk, dot


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _sq_dist(vec_col: Column, centroid: Sequence[float]) -> Column:
    c = _lit_vec(centroid)
    diff = F.zip_with(vec_col, c, lambda a, b: a.cast("double") - b)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)


def assign_clusters(
    embeddings: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Nearest-centroid assignment (argmin over k squared distances; ties
    -> lowest cluster id).  No shuffle.

    The k distances land in one array column materialized in its own
    projection before the argmin reads it twice — a chained
    when(d<best,...) formulation re-evaluates the distance expressions
    combinatorially (no CSE across expression references) and is ~10x
    slower.
    """
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    with_dists = embeddings.withColumn("_dists", dists)
    return with_dists.withColumn(
        out_col,
        (F.array_position(F.col("_dists"), F.array_min(F.col("_dists"))) - 1).cast(
            "int"
        ),
    ).drop("_dists")


def assign_clusters_vectorized(
    embeddings: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Nearest-centroid assignment via Arrow-batched numpy — the large-k
    path.

    ``assign_clusters`` compiles k x dim literal nodes into the plan: fine
    for k <= ~16, but a production IVF index (k = 1024+, dim = 768) would
    be a million-node expression tree that Catalyst chokes on.  Here the
    centroid matrix rides inside the mapInPandas closure (k x dim floats,
    task-broadcast once) and each Arrow batch does ONE numpy matmul:
    argmin_c(|v|^2 - 2 v.C^T + |c|^2), identical ties-to-lowest-id
    semantics via argmin's first-match rule.  Still a narrow map — no
    shuffle, composes with the same ivf_topk/bucketed-write downstream.
    """
    import numpy as np
    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype=np.float64)  # k x dim
    c_sq = (cmat * cmat).sum(axis=1)  # |c|^2 per centroid

    out_schema = T.StructType(
        embeddings.schema.fields + [T.StructField(out_col, T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf):
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # |v-c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 constant per row,
                # so argmin needs only the cross term and |c|^2
                d = c_sq[None, :] - 2.0 * (v @ cmat.T)
                pdf = pdf.assign(**{out_col: d.argmin(axis=1).astype("int32")})
            else:
                pdf = pdf.assign(**{out_col: np.array([], dtype="int32")})
            yield pdf

    return embeddings.mapInPandas(assign, schema=out_schema)


#: above this k, ``train_centroids`` switches each Lloyd assignment from
#: the literal-expression path to the Arrow/numpy path: the expression
#: plan holds k x dim literal nodes, and past ~32 clusters the tree cost
#: (analysis + codegen per iteration) dwarfs the Arrow transfer
VECTORIZED_ASSIGN_K = 32


def train_centroids(
    embeddings: DataFrame,
    k: int,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_mode: str = "auto",
) -> list[list[float]]:
    """Lloyd's k-means on DataFrames: seed with the k lowest-id vectors
    (deterministic), then alternate assign (narrow map) / recompute means
    (posexplode + groupBy — one shuffle per iteration on (cluster, pos)).

    ``assign_mode``: "expression" (literal-array argmin, whole-stage
    codegen), "vectorized" (Arrow-batched numpy matmul), or "auto" —
    expression up to ``VECTORIZED_ASSIGN_K`` clusters, vectorized beyond
    (a production index at k=1024/dim=768 would otherwise compile a
    million-node expression tree per iteration).  Both paths share
    identical ties-to-lowest-id semantics, so the trained centroids are
    the same either way.

    The driver only ever holds k×dim floats.  For 100 TB, train on a
    sample (``embeddings.sample(...)``) — assignment still runs over the
    full corpus.
    """
    if assign_mode not in ("auto", "expression", "vectorized"):
        raise ValueError(f"unknown assign_mode: {assign_mode!r}")
    use_vectorized = (
        assign_mode == "vectorized"
        or (assign_mode == "auto" and k > VECTORIZED_ASSIGN_K)
    )
    assign = assign_clusters_vectorized if use_vectorized else assign_clusters

    seed_rows = embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in seed_rows]

    for _ in range(iterations):
        assigned = assign(embeddings, centroids, vec_col=vec_col)
        means = (
            assigned.select(
                "cluster_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # keep empty clusters
        by_cluster: dict[int, dict[int, float]] = {}
        for row in means:
            by_cluster.setdefault(row["cluster_id"], {})[row["pos"]] = row["mean"]
        for cid, comps in by_cluster.items():
            new_centroids[cid] = [comps[p] for p in sorted(comps)]
        centroids = new_centroids
    return centroids


def ivf_topk(
    embeddings_with_clusters: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Probe the ``n_probe`` centroids nearest the query, exact cosine
    re-rank inside those clusters only.

    With the table partitioned/bucketed by ``cluster_col``, the IN filter
    is partition pruning: the scan touches ~n_probe/k of the corpus.
    """
    dists = [
        sum((float(a) - float(b)) ** 2 for a, b in zip(query_vec, c))
        for c in centroids
    ]
    probe = sorted(range(len(centroids)), key=lambda i: (dists[i], i))[:n_probe]
    candidates = embeddings_with_clusters.filter(F.col(cluster_col).isin(probe))
    return cosine_topk(candidates, query_vec, k, id_col=id_col, vec_col=vec_col)
