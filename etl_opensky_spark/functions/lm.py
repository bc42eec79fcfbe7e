"""Distributed n-gram language modeling for corpus quality filtering.

CCNet-style pipelines (Wenzek et al., 2020) score every document with a
language-model negative log-likelihood and keep/bucket by perplexity.  At
100 TB a neural LM pass is a GPU fleet; a corpus-trained n-gram LM is a
few Spark aggregates — and is exactly what CCNet's KenLM stage computes.
This module trains an add-one-smoothed bigram LM over the corpus itself
and scores each document, entirely in DataFrame ops:

1. tokenize per row (narrow, no shuffle);
2. ONE groupBy for unigram counts, ONE for bigram counts (map-side
   combined — the classic word-count shape that scales linearly);
3. per-bigram-type NLL, micro-quantized to exact integers (the DSIR
   pattern, ``sampling.dsir_log_weights``) so results are reproducible
   across engines and partitionings;
4. per-doc score = equi-join of the doc's *distinct* bigrams to the
   stats table (distinct-per-doc first, so the join left side is
   bounded by vocabulary growth, not token count), then an integer sum.

No UDFs, no collect, no broadcast of unbounded state.  The reference has
no LM surface; this extends the text-analysis suite (SURVEY §2 extension,
same family as functions/text.py quality scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.text import tokenize


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, w1, w2, n_occ) — adjacent-token pairs after dropping empty
    tokens, counted within each document first so downstream joins see
    distinct bigrams per doc, not raw token volume."""
    toks = F.filter(tokenize(F.col(text_col)), lambda x: x != F.lit(""))
    df = docs.select(F.col(id_col), toks.alias("_ts")).filter(
        F.size("_ts") >= 2
    )
    pairs = df.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("_ts", 1, F.size("_ts") - 1).alias("w1"),
                F.slice("_ts", 2, F.size("_ts") - 1).alias("w2"),
            )
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    return pairs.groupBy(id_col, "w1", "w2").agg(
        F.count("*").alias("n_occ")
    )


def bigram_nll_scores(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Score every document under a corpus-trained add-1 bigram LM.

    Returns ``(id_col, n_bigrams, nll_micros)`` where ``nll_micros`` is
    the document's total negative log-likelihood in integer micro-nats:
    each bigram type's ``-ln((c(w1,w2)+1) / (c(w1)+V))`` is rounded to
    micros ONCE (so the per-doc sum is exact integer arithmetic —
    associative, partitioning-invariant), then weighted by the bigram's
    in-doc occurrence count.  ``nll_micros / n_bigrams / 1e6`` is the
    average NLL in nats; ``exp`` of that is the document perplexity.

    Smoothing uses the full unigram count as the context count and the
    corpus vocabulary size V — the textbook add-1 estimator.  V rides
    along as a literal from one count-distinct aggregate (a scalar, not
    a broadcast table).
    """
    bigrams = _doc_bigrams(docs, id_col, text_col).cache()

    # corpus-level stats: bigram-type counts, unigram context counts, V
    bg_counts = bigrams.groupBy("w1", "w2").agg(
        F.sum("n_occ").alias("c12")
    )
    toks = docs.select(
        F.explode(
            F.filter(tokenize(F.col(text_col)), lambda x: x != F.lit(""))
        ).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    vocab_size = uni.count()  # scalar V — one job, result is a literal

    nll = (
        bg_counts.join(uni, bg_counts["w1"] == uni["w"], "inner")
        .drop("w")
        .withColumn(
            "nll_micros_per_occ",
            F.round(
                -F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.lit(float(vocab_size)))
                )
                * 1_000_000.0
            ).cast("bigint"),
        )
        .select("w1", "w2", "nll_micros_per_occ")
    )

    scored = (
        bigrams.join(nll, ["w1", "w2"], "inner")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("nll_micros_per_occ"))
            .cast("bigint")
            .alias("nll_micros"),
        )
    )
    return scored


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation mining: pointwise mutual information of
    adjacent-token pairs — ``PMI(w1,w2) = ln(c12 * N / (c1 * c2))``
    where counts are corpus totals over adjacent positions and N is the
    total number of adjacent positions.

    Returns ``(w1, w2, c12, pmi_micros)`` for pairs with
    ``c12 >= min_pair_count``, PMI micro-quantized to integer
    micro-nats (one rounding per pair type; everything upstream is
    exact integer counting, so the result is engine- and partitioning-
    invariant — the DSIR/bigram-LM quantization rule).

    Scale shape: the pair and unigram tables are vocabulary-bounded
    (Heaps-law sublinear in corpus size), built by TWO map-side-combined
    word-count aggregates; the PMI join joins count TABLES, never rows
    of the corpus.  ``min_pair_count`` prunes the long tail before the
    unigram joins.  No UDFs, no collect, no global sort.
    """
    toks = F.filter(tokenize(F.col(text_col)), lambda x: x != F.lit(""))
    base = docs.select(toks.alias("_ts")).filter(F.size("_ts") >= 2)
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice("_ts", 1, F.size("_ts") - 1).alias("w1"),
                F.slice("_ts", 2, F.size("_ts") - 1).alias("w2"),
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))

    # ONE corpus pass: the unpruned pair-count table is vocabulary-
    # bounded, and every downstream quantity — pruned pairs, both
    # position marginals, N — derives from it.  Without the checkpoint
    # Catalyst re-tokenizes the corpus once per consumer (measured: the
    # plan sweep showed 4 corpus scans — the q112 exchange-reuse lesson
    # again: reuse does not fire across differently-aggregated
    # consumers).
    pc_all = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint()
    )
    pair_counts = pc_all.filter(F.col("c12") >= min_pair_count)

    # position-marginal counts: w as the LEFT (w1) and RIGHT (w2) member
    # of an adjacent pair — the marginals of the same joint distribution
    # (using raw unigram counts instead would make rows' PMI not sum
    # from the same N and bias boundary tokens).  Re-aggregated from the
    # pair-count TABLE, never from the corpus.
    left = pc_all.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c12").alias("c1")
    )
    right = pc_all.groupBy(F.col("w2").alias("w")).agg(
        F.sum("c12").alias("c2")
    )
    n_pairs = pc_all.agg(F.sum("c12")).collect()[0][0]  # scalar N

    return (
        pair_counts.join(left, pair_counts["w1"] == left["w"], "inner")
        .drop("w")
        .join(right, pair_counts["w2"] == right["w"], "inner")
        .drop("w")
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.lit(float(n_pairs))
                    / (
                        F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                )
                * 1_000_000.0
            ).cast("bigint").alias("pmi_micros"),
        )
    )


def discounted_bigram_nll_scores(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    discount_quarters: int = 3,
) -> DataFrame:
    """Score held-out documents under an INTERPOLATED ABSOLUTE-
    DISCOUNTING bigram LM (the Kneser–Ney family — the smoothing that
    actually ships in KenLM/CCNet, vs :func:`bigram_nll_scores`'s
    add-one baseline) with a true train/eval split::

        P(w|v) = max(c(vw) - d, 0)/c(v) + d·N1+(v·)/c(v) · Pcont(w)
        Pcont(w) = (N1+(·w) + 1) / (N1+(··) + V)        # add-1 floor
        unseen context v  ->  P(w|v) = Pcont(w)

    with ``d = discount_quarters/4`` (default 0.75) kept RATIONAL: the
    discounted numerators are exact integers in quarter-units
    (``max(4c-3, 0)`` over ``4·c(v)``), so the only floating point is
    two divides, one multiply-add, and the final ``ln`` — each in ONE
    pinned expression order, micro-quantized per bigram type (q106
    pattern) so per-doc sums are exact integers any engine reproduces.

    All model state is vocabulary-shaped aggregate tables (bigram types,
    context totals, continuation counts) flowing through equi-joins —
    the word-count scale family.  Two driver scalars (distinct-bigram
    and vocab counts) ride as literals.  Returns
    ``(id_col, n_bigrams, nll_micros)`` over ``eval_docs``.
    """
    d = discount_quarters
    tbg = (
        _doc_bigrams(train_docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.sum("n_occ").alias("c12"))
        .localCheckpoint()
    )
    ctx = tbg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1v")
    )
    cont = tbg.groupBy("w2").agg(F.count("*").alias("n1w"))
    n1pp = tbg.count()
    toks = train_docs.select(
        F.explode(
            F.filter(tokenize(F.col(text_col)), lambda x: x != F.lit(""))
        ).alias("w")
    )
    vocab = toks.distinct().count()
    denom = float(n1pp + vocab)

    ev = _doc_bigrams(eval_docs, id_col, text_col)
    types = ev.select("w1", "w2").distinct()
    joined = (
        types.join(tbg, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
    )
    pcont = (F.coalesce(F.col("n1w"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / F.lit(denom)
    term1 = (
        F.greatest(
            F.lit(4) * F.coalesce(F.col("c12"), F.lit(0)) - F.lit(d),
            F.lit(0),
        ).cast("double")
        / (F.lit(4) * F.col("c1")).cast("double")
    )
    lam = (F.lit(d) * F.col("n1v")).cast("double") / (
        F.lit(4) * F.col("c1")
    ).cast("double")
    p = F.when(F.col("c1").isNotNull(), term1 + lam * pcont).otherwise(pcont)
    nll = joined.select(
        "w1",
        "w2",
        F.round(-F.log(p) * 1_000_000.0).cast("bigint").alias("nll_mu"),
    )
    return (
        ev.join(nll, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("nll_mu"))
            .cast("bigint")
            .alias("nll_micros"),
        )
    )
