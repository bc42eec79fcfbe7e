"""Product quantization (PQ) for approximate nearest neighbor search.

Completes the quantized-ANN family (int8 scalar = ``quantized_topk``,
1-bit = ``binary_hamming_topk``, coarse partitioning = ``ivf``): PQ
splits each vector into ``m`` subspaces, k-means-codes every subspace
independently (codebook of ``k`` centroids each), and a query scans
CODES — per row the approximate distance is ``m`` table lookups
(asymmetric distance computation, ADC), not a ``dim``-length dot
product.  Memory per vector drops from ``4·dim`` bytes to ``m`` code
bytes (Jégou et al., PAMI 2011 — the workhorse inside FAISS' IVF-PQ).

Spark-first shape, same contract as ``functions.clustering``:

- training = ``m`` independent Lloyd loops over SLICES of the vector
  (one shuffle per iteration each; the sliced frame is checkpointed
  once); centroids are driver scalars (k·dim/m ints per subspace);
- encoding is a pure Column expression (argmin over literal centroid
  arrays — no shuffle, no Python);
- ADC lookup tables are computed ON THE DRIVER from the query alone
  (m·k ints) and embedded as literals: the scan does ``m``
  ``element_at`` calls per row inside codegen;
- floats are micro-quantized once (``QUANT_SCALE``), every distance is
  an exact integer — deterministic across engines and partitionings,
  so recall against the exact top-k is a REPRODUCIBLE number a gate
  can pin (q285).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.clustering import (
    QUANT_SCALE,
    _assign,
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
    (deterministic seeds: the first ``k`` vectors by id, exactly the
    ``clustering.kmeans`` contract).  Returns driver-side integer
    centroids in quantized units.  Cost: m·iters update shuffles over
    an ``n × dim/m`` sliced frame; the full vectors are exchanged
    never, and empty clusters are dropped (never reseeded)."""
    vq = emb.select(
        F.col(id_col).alias("_id"), _quantize(emb, vec_col).alias("_fullq")
    ).localCheckpoint(eager=False)
    books: Codebooks = []
    for start, length in _subspace_bounds(dim, m):
        sub = vq.select(
            "_id", F.slice("_fullq", start, length).alias("_vq")
        )
        seeds = sub.orderBy("_id").limit(k).collect()
        cents = [(i + 1, list(r["_vq"])) for i, r in enumerate(seeds)]
        for _ in range(iters):
            rows = (
                _assign(sub, cents)
                .select("_cid", F.posexplode("_vq").alias("_pos", "_val"))
                .groupBy("_cid", "_pos")
                .agg(F.sum("_val").alias("_s"), F.count("*").alias("_n"))
                .select(
                    "_cid", "_pos",
                    F.floor(F.col("_s") / F.col("_n")).cast("long")
                    .alias("_c"),
                )
                .collect()
            )
            by_cid: dict[int, dict[int, int]] = {}
            for r in rows:
                by_cid.setdefault(r["_cid"], {})[r["_pos"]] = r["_c"]
            cents = [
                (cid, [comps[p] for p in sorted(comps)])
                for cid, comps in sorted(by_cid.items())
            ]
        books.append(cents)
    return books


def _code_expr(books: Codebooks, bounds) -> list:
    """Per-subspace nearest-centroid code as pure Column expressions
    over the quantized full vector ``_fullq``."""
    exprs = []
    for (start, length), cents in zip(bounds, books):
        sub = F.slice("_fullq", start, length)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub, F.lit(cq), lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for _, cq in cents
            ]
        )
        cid_lit = F.lit([cid for cid, _ in cents])
        exprs.append(
            F.element_at(
                cid_lit,
                F.array_position(dists, F.array_min(dists)).cast("int"),
            )
        )
    return exprs


def pq_encode(
    emb: DataFrame,
    books: Codebooks,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One code (1..k) per subspace per row — ``(id, codes array<int>)``.
    Ties break to the lowest centroid id (first minimal slot), matching
    training assignment."""
    bounds = _subspace_bounds(dim, len(books))
    vq = emb.select(
        F.col(id_col), _quantize(emb, vec_col).alias("_fullq")
    )
    return vq.select(
        id_col, F.array(*_code_expr(books, bounds)).alias("codes")
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
    bounds = _subspace_bounds(
        len(qq), len(books)
    )
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
