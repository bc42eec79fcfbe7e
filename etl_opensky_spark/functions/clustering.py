"""Distributed k-means over an embedding column (Lloyd's algorithm).

The clustering building block of a training-data pipeline: diversity
sampling, SemDeDup-style per-cluster dedup, and IVF coarse quantizers
all start from "assign every vector to its nearest centroid, update,
repeat".

Spark-first shape (the same one MLlib uses):

- **assignment is shuffle-free**: centroids are k×dim driver scalars
  (the ONLY collect — k rows, the legitimate scalar-aggregate kind),
  embedded as literal arrays; per-row distance is a pure Column
  expression (``zip_with`` + ``aggregate``), so the full data is
  never exchanged to be assigned;
- **update is one shuffle per iteration**: ``posexplode`` →
  ``groupBy(cluster, pos)`` with map-side partial sums — the moved
  bytes are k·dim partials per task, not the data;
- the quantized vector frame is ``localCheckpoint``-ed once: every
  iteration re-reads the materialized rows instead of re-running the
  scan lineage (and the plan cannot nest round-over-round).

Determinism (what makes an ITERATIVE algorithm oracle-checkable):
floats are quantized up front to integer micro-units
(``round(x*1e6) AS BIGINT``), distances are exact integer sums, and
centroid updates use ``floor(sum/count)`` on IEEE doubles (exact for
these magnitudes) — every engine computes bit-identical centroids, so
round counts and total distortion hash-match a DuckDB oracle running
the same recursion.  Ties break to the lowest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-unit quantization: exact integer arithmetic thereafter
QUANT_SCALE = 1_000_000


def _quantize(df: DataFrame, vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"),
    )


def _distances(cents: list[tuple[int, list[int]]]) -> F.Column:
    """Array of exact squared distances to each centroid (JVM Column
    expression over the quantized vector — no shuffle, no Python)."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with("_vq", F.lit(cq), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for _, cq in cents
        ]
    )


def _assign(vq_df: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment; ties break to the lowest centroid id
    (``array_position`` returns the FIRST minimal slot)."""
    cid_lit = F.lit([cid for cid, _ in cents])
    dists = _distances(cents)
    return (
        vq_df.withColumn("_d", dists)
        .withColumn("_slot", F.array_position("_d", F.array_min("_d")))
        .select(
            "*",
            F.element_at(cid_lit, F.col("_slot").cast("int")).alias("_cid"),
            F.element_at("_d", F.col("_slot").cast("int")).alias("_dist"),
        )
        .drop("_d", "_slot")
    )


def kmeans(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    keep_vectors: bool = False,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from a deterministic init (the
    first ``k`` vectors by ``id_col``) and return the final assignment:
    one row per input vector with ``cluster_id`` (1-based) and the
    exact integer squared distance ``sq_dist`` in quantized units.
    Empty clusters are dropped (never reseeded) so the recursion stays
    engine-reproducible.  ``keep_vectors=True`` carries the quantized
    vector through as ``_vq`` so downstream consumers (semdedup) avoid
    a re-scan + join-on-id shuffle of the full data.
    """
    # lazy checkpoint: lineage is truncated all the same, but the
    # materialization happens INSIDE the first scheduled job (the fused
    # seed+round-1 update) instead of paying a dedicated eager job
    vq_df = emb.select(
        F.col(id_col), _quantize(emb, vec_col).alias("_vq")
    ).localCheckpoint(eager=False)

    def update_round(assigned: DataFrame) -> list[tuple[int, list[int]]]:
        # one shuffle: per-(cluster, position) partial sums, then the
        # k*dim totals come back as driver scalars for the next round
        new_rows = (
            assigned.select("_cid", F.posexplode("_vq").alias("_pos", "_val"))
            .groupBy("_cid", "_pos")
            .agg(F.sum("_val").alias("_s"), F.count("*").alias("_n"))
            .select(
                "_cid",
                "_pos",
                F.floor(F.col("_s") / F.col("_n")).cast("long").alias("_c"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in new_rows:
            by_cid.setdefault(r["_cid"], {})[r["_pos"]] = r["_c"]
        return [
            (cid, [comps[p] for p in sorted(comps)])
            for cid, comps in sorted(by_cid.items())
        ]

    # deterministic init: first k vectors by id, cluster ids 1..k.
    # The seeds are NEVER collected when an update round follows: they
    # ride executor-side as ONE array-of-structs row (broadcast 1-row
    # cross join — no shuffle), the per-row argmin is a pure expression
    # (array_min over struct(d, cid): lowest distance, ties to lowest
    # cid — the same order _assign's array_position gives), and the
    # first update round's aggregate is the FIRST job after the
    # checkpoint: seed collect + round-1 collect fused into one
    # (NOTES_r3 residual; job count pinned by test).  TakeOrdered +
    # array_sort + transform-with-index — no window, no extra exchange.
    seed_struct = (
        vq_df.orderBy(id_col)
        .limit(k)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col), F.col("_vq")))
            ).alias("_raw")
        )
        .select(
            F.transform(
                F.col("_raw"),
                lambda s, i: F.struct(
                    (i + 1).cast("int").alias("_scid"),
                    s["_vq"].alias("_svq"),
                ),
            ).alias("_seeds")
        )
    )
    if iters == 0:
        seed_rows = vq_df.orderBy(id_col).limit(k).collect()
        cents: list[tuple[int, list[int]]] = [
            (i + 1, list(r["_vq"])) for i, r in enumerate(seed_rows)
        ]
    else:
        d2 = lambda s: F.aggregate(  # noqa: E731 — exact same arithmetic as _distances
            F.zip_with(F.col("_vq"), s["_svq"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        best = F.array_min(
            F.transform(
                F.col("_seeds"),
                lambda s: F.struct(d2(s).alias("d"), s["_scid"].alias("cid")),
            )
        )
        first_assigned = vq_df.join(F.broadcast(seed_struct)).select(
            best["cid"].alias("_cid"), F.col("_vq")
        )
        cents = update_round(first_assigned)

    for _ in range(max(iters - 1, 0)):
        cents = update_round(_assign(vq_df, cents))

    final = _assign(vq_df, cents)
    cols = [
        F.col(id_col),
        F.col("_cid").alias("cluster_id"),
        F.col("_dist").alias("sq_dist"),
    ]
    if keep_vectors:
        cols.append(F.col("_vq"))
    return final.select(*cols)


def kmeans_summary(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Per-cluster size and total distortion after ``iters`` rounds —
    the hash-exact gate surface for the iterative algorithm."""
    a = kmeans(emb, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return a.groupBy("cluster_id").agg(
        F.count("*").alias("n"),
        F.sum("sq_dist").alias("total_sq_dist"),
    )


def semdedup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 1,
    threshold_bp: int = 4500,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    k-means, then inside each cluster drop every vector whose cosine
    similarity to a LOWER-id cluster-mate reaches ``threshold_bp``
    (basis points, 4500 = 0.45).  Clustering bounds the candidate pairs
    to same-cluster members — the whole point of the method at corpus
    scale: k is chosen so clusters are small, and the pair join is an
    equi-join on ``cluster_id``, never all-pairs.

    One-pass drop rule (drop b iff some a < b in the same cluster is
    similar): deterministic and engine-reproducible, unlike the
    sequential keep-set walk, at the cost of occasionally dropping a
    little more.

    The cosine test is EXACT integer arithmetic on the quantized
    vectors — ``cos(a,b) >= t`` tested as ``dot >= 0 AND
    1e8*dot^2 >= t_bp^2 * |a|^2 * |b|^2`` in DECIMAL(38,0) — so there
    is no float-threshold margin to verify: any engine computes the
    identical keep set.

    Returns per-cluster ``(cluster_id, n_members, n_kept)``.
    """
    assigned = kmeans(
        emb, vec_col=vec_col, id_col=id_col, k=k, iters=iters,
        keep_vectors=True,
    )
    dec = "decimal(38,0)"
    members = (
        assigned
        .select(
            F.col(id_col),
            "cluster_id",
            "_vq",
            F.aggregate(
                F.zip_with("_vq", "_vq", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            .cast(dec)
            .alias("_n2"),
        )
    )
    a = members.select(
        F.col("cluster_id").alias("_c"),
        F.col(id_col).alias("_ida"),
        F.col("_vq").alias("_vqa"),
        F.col("_n2").alias("_n2a"),
    )
    b = members.select(
        F.col("cluster_id").alias("_c"),
        F.col(id_col).alias("_idb"),
        F.col("_vq").alias("_vqb"),
        F.col("_n2").alias("_n2b"),
    )
    dot = F.aggregate(
        F.zip_with("_vqa", "_vqb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, on="_c")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn("_dot", dot)
    )
    dropped = (
        pairs.filter(
            (F.col("_dot") >= 0)
            & (
                F.col("_dot").cast(dec) * F.col("_dot").cast(dec)
                * F.lit(100_000_000).cast(dec)
                >= F.lit(threshold_bp * threshold_bp).cast(dec)
                * F.col("_n2a") * F.col("_n2b")
            )
        )
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    kept_flag = members.join(dropped.withColumn("_drop", F.lit(1)), on=id_col, how="left")
    return kept_flag.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.count_if(F.col("_drop").isNull()).alias("n_kept"),
    )


def simplified_silhouette(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-point SIMPLIFIED silhouette: cohesion/separation measured
    against cluster CENTROIDS instead of all co-members — the
    linear-time formulation (one pass vs the O(n^2) pairwise classic)
    and the only silhouette that survives 100 TB: exact pairwise
    silhouette is an all-pairs self-join, centroid silhouette is one
    aggregate + one broadcast join.

    ``a = ||x - c_own||``, ``b = min over other labels ||x - c_l||``,
    ``s = (b - a) / max(a, b)`` (0 when both are 0, null for a single
    cluster).

    Spark shape: quantized vectors (micro-units, same as
    :func:`kmeans`) are pos-exploded once; centroids are an
    (n x dim)-row map-side-combined aggregate with floor(sum/count)
    integer division; the point-to-every-centroid distances come from
    ONE broadcast join of the exploded points against the (labels x
    dim)-row centroid table, aggregated back per (point, label).  All
    distance arithmetic is exact integers; the final sqrt/divide are
    single IEEE double ops, so a SQL oracle replays bit-identically.

    Returns ``(id_col, label_col, a_sq, b_sq, silhouette)``.
    """
    ex = emb.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(_quantize(emb, vec_col)).alias("_pos", "_q"),
    )
    cent = (
        ex.groupBy(F.col(label_col).alias("_clabel"), "_pos")
        .agg(F.sum("_q").alias("_s"), F.count("*").alias("_n"))
        .select("_clabel", "_pos", F.expr("_s div _n").alias("_c"))
    )
    diff = F.col("_q") - F.col("_c")
    d = (
        ex.join(F.broadcast(cent), "_pos")
        .groupBy(id_col, label_col, "_clabel")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    per_point = d.groupBy(id_col, label_col).agg(
        F.min(
            F.when(F.col("_clabel") == F.col(label_col), F.col("_d2"))
        ).alias("a_sq"),
        F.min(
            F.when(F.col("_clabel") != F.col(label_col), F.col("_d2"))
        ).alias("b_sq"),
    )
    a = F.sqrt(F.col("a_sq").cast("double"))
    b = F.sqrt(F.col("b_sq").cast("double"))
    s = F.when(F.col("b_sq").isNull(), F.lit(None).cast("double")).otherwise(
        F.when(F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)).otherwise(
            F.lit(0.0)
        )
    )
    return per_point.select(
        id_col, label_col, "a_sq", "b_sq", s.alias("silhouette")
    )
