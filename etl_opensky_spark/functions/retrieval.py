"""Hybrid retrieval: rank fusion over lexical + dense scorers.

Training-data curation and eval-set mining both need "find the best
documents for this query" where neither BM25 (functions/text.py) nor
embedding cosine (functions/similarity.py) alone is reliable —
reciprocal-rank fusion (Cormack et al., 2009) is the standard
score-free combiner: ``RRF(d) = Σ_s 1/(k + rank_s(d))``.

Scale shape: each scorer produces a bounded top-n via Spark's
distributed TakeOrdered (per-partition heap + driver merge of n — no
global sort shuffle); rank assignment then runs a window over those n
rows only (single partition of n ≤ a few hundred rows, bounded by the
cutoff, never by corpus size); the fusion join is n×n row tables.  The
corpus-sized work stays in the scorers, which are shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_topn(
    scored: DataFrame,
    score_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """(id, rank) for the top-``n`` rows by ``score_col`` (desc, ties on
    id asc).  sort+limit is a distributed TakeOrdered; the row_number
    window then touches only those ``n`` rows."""
    top = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(n)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.select(
        F.col(id_col), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 60,
) -> DataFrame:
    """Fuse two ``(id, rank)`` lists into ``(id, rank_a, rank_b,
    rrf_micros)``.

    ``rrf_micros`` is ``round(1e6 · Σ 1/(k+rank))`` as bigint — the
    reciprocal terms are identical IEEE doubles on any engine given the
    same integer ranks, and quantizing the 1-or-2-term sum once keeps
    the output hash-stable (the DSIR micro-quantization pattern).
    Documents missing from one list contribute 0 from that scorer
    (full-outer semantics).
    """
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = a.join(b, [id_col], "full_outer")
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(k)) + F.col(r).cast("double")), F.lit(0.0)
    )
    return fused.select(
        id_col,
        "rank_a",
        "rank_b",
        F.round((term("rank_a") + term("rank_b")) * 1_000_000.0)
        .cast("bigint")
        .alias("rrf_micros"),
    )
