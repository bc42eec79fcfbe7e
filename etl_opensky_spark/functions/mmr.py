"""Maximal Marginal Relevance (MMR) — diversified top-k retrieval.

Carbonell & Goldstein (SIGIR '98): greedily pick the item that best
trades relevance to the query against redundancy with what's already
picked — the de-duplicating re-rank step behind RAG context assembly
and search-result diversification.  With similarities expressed as
NEGATED exact-integer squared distances (micro-quantized, the
``functions.clustering`` convention) and λ = 1/2, each greedy step is

    argmin_i [ d(q, i) − min_{j ∈ selected} d(i, j) ]          (ties → lowest id)

— all integer arithmetic, so the pick sequence is deterministic across
engines and partitionings and a DuckDB oracle can UNROLL the greedy
recursion (q286).

Scale shape: the greedy loop is driver-coordinated but never touches
the corpus — step 0 restricts to the top-``candidates`` by pure
relevance (one distributed TakeOrdered over the data), and every later
step scans only that cached candidate set computing ``least()`` over
the ≤ k already-selected vectors embedded as literals.  k·candidates
work total; the corpus is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.clustering import QUANT_SCALE


def _sqdist_to(lit_vec: list[int]):
    return lambda col: F.aggregate(
        F.zip_with(col, F.lit(lit_vec), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def mmr_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 5,
    candidates: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy MMR pick of ``k`` items (λ = 1/2 in integer form).
    Returns ``(pick_rank, id, rel_dist, score)`` where ``score`` is the
    minimized objective at pick time (first pick: pure relevance, score
    = rel_dist).  One corpus TakeOrdered + k tiny candidate scans."""
    qq = [round(float(x) * QUANT_SCALE) for x in query]
    vq = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(
            vec_col,
            lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"),
        ).alias("_vq"),
    )
    cand = (
        vq.withColumn("_dq", _sqdist_to(qq)(F.col("_vq")))
        .orderBy("_dq", "_id")
        .limit(candidates)
        .localCheckpoint()
    )
    picked: list[tuple[int, int, int, list[int]]] = []  # (id, dq, score, vq)
    for _ in range(k):
        remaining = cand
        if picked:
            remaining = cand.filter(
                ~F.col("_id").isin([p[0] for p in picked])
            )
            min_d = F.least(
                *[_sqdist_to(p[3])(F.col("_vq")) for p in picked]
            ) if len(picked) > 1 else _sqdist_to(picked[0][3])(F.col("_vq"))
            scored = remaining.withColumn(
                "_score", F.col("_dq") - min_d
            )
        else:
            scored = remaining.withColumn("_score", F.col("_dq"))
        row = scored.orderBy("_score", "_id").limit(1).collect()[0]
        picked.append(
            (row["_id"], row["_dq"], row["_score"], list(row["_vq"]))
        )
    spark = emb.sparkSession
    return spark.createDataFrame(
        [
            (i + 1, pid, dq, score)
            for i, (pid, dq, score, _v) in enumerate(picked)
        ],
        f"pick_rank int, {id_col} long, rel_dist long, score long",
    )


def mmr_oracle_sql(
    k: int = 5, candidates: int = 100, query_id: int = 0
) -> str:
    """DuckDB replay of the identical greedy recursion, unrolled: one
    CTE per pick, ``least()`` over the previous picks' distances."""
    dist = (
        "CAST(list_sum(list_transform(range(len({a})),"
        " i -> ({a}[i+1]-{b}[i+1])*({a}[i+1]-{b}[i+1]))) AS BIGINT)"
    )
    parts = [
        "v AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS vq"
        " FROM embeddings)",
        f"q AS (SELECT vq AS qv FROM v WHERE vec_id = {query_id})",
        "cand AS (SELECT v.vec_id, v.vq, "
        + dist.format(a="v.vq", b="q.qv")
        + f" AS dq FROM v, q WHERE v.vec_id <> {query_id}"
        f" ORDER BY dq, vec_id LIMIT {candidates})",
        "s1 AS (SELECT vec_id, vq, dq, dq AS score FROM cand"
        " ORDER BY dq, vec_id LIMIT 1)",
    ]
    for t in range(2, k + 1):
        prev = ", ".join(f"s{j}" for j in range(1, t))
        not_in = " AND ".join(
            f"c.vec_id <> s{j}.vec_id" for j in range(1, t)
        )
        ds = [dist.format(a="c.vq", b=f"s{j}.vq") for j in range(1, t)]
        least = ds[0] if len(ds) == 1 else "LEAST(" + ", ".join(ds) + ")"
        parts.append(
            f"s{t} AS (SELECT c.vec_id, c.vq, c.dq,"
            f" c.dq - {least} AS score"
            f" FROM cand c, {prev} WHERE {not_in}"
            f" ORDER BY score, c.vec_id LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS pick_rank, vec_id, dq AS rel_dist, score FROM s{t}"
        for t in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel
