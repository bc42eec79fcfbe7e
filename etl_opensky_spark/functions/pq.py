"""Product quantization (PQ) for approximate nearest neighbor search.

Completes the quantized-ANN family (int8 scalar = ``quantized_topk``,
1-bit = ``binary_hamming_topk``, coarse partitioning = ``ivf``): PQ
splits each vector into ``m`` subspaces, k-means-codes every subspace
independently (codebook of ``k`` centroids each), and a query scans
CODES — per row the approximate distance is ``m`` table lookups
(asymmetric distance computation, ADC), not a ``dim``-length dot
product.  Memory per vector drops from ``4·dim`` bytes to ``m`` code
bytes (Jégou et al., PAMI 2011 — the workhorse inside FAISS' IVF-PQ).

Spark-first shape, same determinism contract as
``functions.clustering`` (micro-quantized integers end-to-end, ties to
the lowest centroid id, so codes/recall are identical on any engine or
partitioning):

- assignment = EXPLODE each vector into its m subvectors and
  broadcast-join the (m·k)-row centroid table: ONE ``zip_with``
  distance lambda in the whole plan, evaluated per (row, centroid)
  pair.  The first version inlined m·k = 256 per-centroid distance
  expressions instead — 5.5 s of py4j expression BUILDING plus a
  codegen-hostile tree per iteration (measured 25 s/train at 2 k rows;
  this shape is ~2 s, bit-identical output).  SCALE.md lesson 8 again:
  the cost was never the data, it was the expression tree.
- training = 1 seed collect + (2 shuffles of n·m pair rows + 1 small
  collect) per Lloyd iteration, ALL subspaces together;
- ADC lookup tables are computed ON THE DRIVER from the query alone
  (m·k ints) and embedded as literals: the scan does ``m``
  ``element_at`` calls per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.clustering import (
    QUANT_SCALE,
    _quantize,
)

Codebooks = list[list[tuple[int, list[int]]]]  # [subspace][(cid, centroid)]


def _subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """(start, length) per subspace, 1-based starts for ``F.slice``;
    dim need not divide m — the last subspace takes the remainder."""
    if not 1 <= m <= dim:
        raise ValueError(f"need 1 <= m <= dim, got m={m} dim={dim}")
    step = dim // m
    out = []
    for j in range(m):
        start = j * step + 1
        length = step if j < m - 1 else dim - step * (m - 1)
        out.append((start, length))
    return out


def _subvectors(vq: DataFrame, bounds) -> DataFrame:
    """``(_id, _j, _sv)``: one row per (vector, subspace) — m slice
    expressions total, exploded."""
    return vq.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_j"),
                        F.slice("_fullq", start, length).alias("_sv"),
                    )
                    for j, (start, length) in enumerate(bounds)
                ]
            )
        ).alias("_s"),
    ).select("_id", F.col("_s._j").alias("_j"), F.col("_s._sv").alias("_sv"))


def _centroid_df(spark, books: Codebooks) -> DataFrame:
    rows = [
        (j, cid, cvec)
        for j, cents in enumerate(books)
        for cid, cvec in cents
    ]
    return spark.createDataFrame(
        rows, "_j int, _cid int, _cv array<long>"
    )


def _pair_dist(max_len: int):
    """Squared distance between the pair columns ``_sv``/``_cv``.
    Subvectors are SHORT (dim/m, typically 4–8), so the sum is UNROLLED
    to plain codegen arithmetic — higher-order lambdas are interpreted
    per element, and at n·m·k pair rows that interpretation dominated
    the sf1 sweep (28 s → ~9 s measured, bit-identical).  Unequal
    subspace lengths (dim % m remainder) zero-fill through
    null-coalesced element_at, which is exact because both arrays are
    null/absent at the same positions."""
    if max_len <= 16:
        terms = None
        for i in range(1, max_len + 1):
            d = F.coalesce(
                F.element_at("_sv", i), F.lit(0)
            ) - F.coalesce(F.element_at("_cv", i), F.lit(0))
            t = d * d
            terms = t if terms is None else terms + t
        return terms.cast("long")
    return F.aggregate(
        F.zip_with("_sv", "_cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_codes(vq: DataFrame, books: Codebooks, bounds) -> DataFrame:
    """``(_id, _j, _cid, _sv)``: nearest centroid per (vector,
    subspace); ties to the lowest cid via min(struct(dist, cid))."""
    spark = vq.sparkSession
    pairs = _subvectors(vq, bounds).join(
        F.broadcast(_centroid_df(spark, books)), "_j"
    )
    max_len = max(length for _s, length in bounds)
    return (
        pairs.withColumn("_d", _pair_dist(max_len))
        .groupBy("_id", "_j")
        .agg(
            F.min(F.struct("_d", "_cid")).alias("_best"),
            F.first("_sv").alias("_sv"),  # constant within the group
        )
        .select("_id", "_j", F.col("_best._cid").alias("_cid"), "_sv")
    )


def pq_train(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    iters: int = 2,
) -> Codebooks:
    """Train ``m`` subspace codebooks of ``k`` centroids each
    (deterministic seeds: the first ``k`` vectors by id, the
    ``clustering.kmeans`` contract).  Returns driver-side integer
    centroids in quantized units.  All subspaces train in the same
    jobs; empty clusters are dropped (never reseeded)."""
    bounds = _subspace_bounds(dim, m)
    vq = emb.select(
        F.col(id_col).alias("_id"), _quantize(emb, vec_col).alias("_fullq")
    )
    # a handful of input files must not serialize the n·k pair work:
    # widen to the cluster's parallelism before pinning (one cheap
    # shuffle of the narrow (_id, vec) projection)
    default_par = emb.sparkSession.sparkContext.defaultParallelism
    if vq.rdd.getNumPartitions() < default_par:
        vq = vq.repartition(default_par)
    vq = vq.localCheckpoint(eager=False)
    seed_rows = vq.orderBy("_id").limit(k).collect()
    books: Codebooks = [
        [
            (i + 1, list(r["_fullq"])[start - 1 : start - 1 + length])
            for i, r in enumerate(seed_rows)
        ]
        for (start, length) in bounds
    ]
    for _ in range(iters):
        rows = (
            _assign_codes(vq, books, bounds)
            .select("_j", "_cid", F.posexplode("_sv").alias("_sp", "_val"))
            .groupBy("_j", "_cid", "_sp")
            .agg(F.sum("_val").alias("_s"), F.count("*").alias("_n"))
            .select(
                "_j", "_cid", "_sp",
                F.floor(F.col("_s") / F.col("_n")).cast("long").alias("_c"),
            )
            .collect()
        )
        by_sub: list[dict[int, dict[int, int]]] = [{} for _ in range(m)]
        for r in rows:
            by_sub[r["_j"]].setdefault(r["_cid"], {})[r["_sp"]] = r["_c"]
        books = [
            [
                (cid, [comps[p] for p in sorted(comps)])
                for cid, comps in sorted(by_cid.items())
            ]
            for by_cid in by_sub
        ]
    return books


def pq_encode(
    emb: DataFrame,
    books: Codebooks,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One code (1..k) per subspace per row — ``(id, codes array<int>)``
    with codes ordered by subspace.  Ties break to the lowest centroid
    id, matching training assignment."""
    bounds = _subspace_bounds(dim, len(books))
    vq = emb.select(
        F.col(id_col).alias("_id"), _quantize(emb, vec_col).alias("_fullq")
    )
    assigned = _assign_codes(vq, books, bounds)
    return (
        assigned.groupBy("_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_j", "_cid"))),
                lambda s: s["_cid"],
            ).alias("codes")
        )
        .select(F.col("_id").alias(id_col), "codes")
    )


def pq_topk(
    codes: DataFrame,
    books: Codebooks,
    query: list[float],
    topn: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-``topn`` by approximate squared distance: the query's
    per-subspace distance to every centroid is computed ON THE DRIVER
    (m·k integers) and embedded as literal lookup tables; the scan does
    ``m`` ``element_at`` lookups + a sum per row — no vector math
    touches the data.  Deterministic ties: (distance, id) ascending."""
    qq = [round(x * QUANT_SCALE) for x in query]
    bounds = _subspace_bounds(len(qq), len(books))
    adc = F.lit(0).cast("long")
    for j, ((start, length), cents) in enumerate(zip(bounds, books)):
        qsub = qq[start - 1 : start - 1 + length]
        # dense table indexed by centroid id (ids may be sparse after
        # empty-cluster drops; missing slots never appear in codes)
        max_cid = max(cid for cid, _ in cents)
        table = [0] * max_cid
        for cid, cq in cents:
            table[cid - 1] = sum((a - b) * (a - b) for a, b in zip(qsub, cq))
        adc = adc + F.element_at(
            F.lit(table).cast("array<long>"), F.element_at("codes", j + 1)
        )
    return (
        codes.select(id_col, adc.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topn)
    )
