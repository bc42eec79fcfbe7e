"""WordPiece-style subword tokenization, distributed.

Applying a learned subword vocabulary (the inference half of tokenizer
training; the training half's pair-counting step is
``text.bpe_pair_counts``) is a per-word WHILE loop — greedy longest
prefix match — that no built-in Spark expression expresses.  The scale
trick makes the Python loop irrelevant: tokenize DISTINCT WORDS, not
the corpus.  Vocabulary grows sublinearly (Heaps' law), so the
imperative work is O(vocab) regardless of corpus size; corpus-scale
work stays declarative (word-count aggregate, piece join).

Pipeline:
1. distinct-word frequency table (one shuffle, map-side combined);
2. vocabulary = single characters ∪ top bigrams ∪ top whole words —
   derived from the corpus itself, deterministically (ties on string);
   bounded by construction, collected once and shipped in the Arrow
   closure (same pattern as ``ivf.assign_clusters_vectorized``);
3. ``mapInPandas`` over distinct words: greedy longest-match loop per
   word (single-char entries guarantee progress and totality);
4. piece-level corpus stats = join pieces back to word frequencies.

No per-corpus-row Python ever runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.text import bpe_pair_counts, tokenize


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    words = docs.select(
        F.explode(tokenize(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count("*").alias("freq"))


def build_vocab(
    docs: DataFrame,
    text_col: str,
    top_bigrams: int = 100,
    top_words: int = 50,
    max_word_len: int = 20,
    word_limit: int = 500,
) -> list[str]:
    """Deterministic corpus-derived piece vocabulary: every single
    character of the tokenized word set, the ``top_bigrams`` most
    frequent character pairs, and the ``top_words`` most frequent whole
    words.  All three tiers come from engine-side aggregates with
    total-order cuts; the result is a BOUNDED list (≲ a few hundred
    entries) safe to collect and close over."""
    wf = (
        _word_freq(docs, text_col)
        .filter(F.length("w") <= max_word_len)
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(word_limit)
    )
    singles = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("piece")
    ).distinct()
    bigrams = bpe_pair_counts(docs, text_col, top_n=top_bigrams).select(
        F.col("pair").alias("piece")
    )
    words = wf.orderBy(F.col("freq").desc(), F.col("w")).limit(
        top_words
    ).select(F.col("w").alias("piece"))
    vocab = (
        singles.unionByName(bigrams).unionByName(words)
        .distinct()
        .orderBy("piece")
    )
    return [r["piece"] for r in vocab.collect()]


def wordpiece_pieces(
    docs: DataFrame,
    text_col: str,
    vocab: list[str],
    max_word_len: int = 20,
    word_limit: int = 500,
) -> DataFrame:
    """Tokenize the corpus's top ``word_limit`` distinct words with a
    greedy longest-match over ``vocab``; returns corpus-level piece
    frequencies ``(piece, n_occurrences)`` (each word's pieces weighted
    by the word's corpus frequency).

    The greedy loop runs inside ONE Arrow-batched ``mapInPandas`` pass
    over the distinct-word table only.
    """
    vocab_set = frozenset(vocab)
    max_piece = max((len(p) for p in vocab_set), default=1)

    wf = (
        _word_freq(docs, text_col)
        .filter(F.length("w") <= max_word_len)
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(word_limit)
    )

    def tok_batches(batches):
        import pandas as pd

        for pdf in batches:
            out_w, out_piece = [], []
            for w in pdf["w"]:
                pos, n = 0, len(w)
                while pos < n:
                    for ln in range(min(max_piece, n - pos), 0, -1):
                        cand = w[pos : pos + ln]
                        if cand in vocab_set:
                            out_w.append(w)
                            out_piece.append(cand)
                            pos += ln
                            break
                    else:  # char not in vocab: emit it alone (UNK-ish)
                        out_w.append(w)
                        out_piece.append(w[pos])
                        pos += 1
            yield pd.DataFrame({"w": out_w, "piece": out_piece})

    pieces = wf.select("w").mapInPandas(tok_batches, "w string, piece string")
    weighted = pieces.join(wf, "w")
    return (
        weighted.groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("piece"))
    )


def bpe_apply_merges(col: Column, merges: Sequence[tuple[str, str]]) -> Column:
    """Apply a learned BPE merge list (rank order) to a word — the
    inference half of byte-pair encoding (Sennrich et al. 2016; the
    training half's pair-count step is ``text.bpe_pair_counts``).

    One chained ``aggregate`` fold per merge rule, entirely Column
    expressions: for merge ``(a, b)``, fold left over the token array
    — if the accumulator's last token is ``a`` and the next is ``b``,
    replace the tail with ``ab``, else append.  The fold IS the
    standard left-to-right non-overlapping merge semantics
    ("aaa" + (a,a) → [aa, a]): once merged, the tail token is ``ab``,
    which no longer matches ``a``.

    Zero shuffle, zero Python — and the intended call shape is over
    the DISTINCT-WORD table (Heaps' law, same as the WordPiece path
    above), never the raw corpus.  Returns ``array<string>`` tokens.
    """
    def fold_rule(a: str, b: str):
        # factory closure, NOT default-arg capture: pyspark's lambda
        # bridge requires exactly (acc, x) named params (SKILL gotcha)
        def merge(acc: Column, x: Column) -> Column:
            return F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return merge

    toks = F.split(col, "")
    for a, b in merges:
        toks = F.aggregate(
            toks, F.array().cast("array<string>"), fold_rule(a, b)
        )
    return toks


def bpe_oracle_sql(vocab_sql: str, merges: Sequence[tuple[str, str]]) -> str:
    """DuckDB replay of ``bpe_apply_merges``: a linear CTE chain, one
    ``list_reduce`` fold per merge (tokens re-wrapped as single-element
    lists each stage so the accumulator stays LIST(VARCHAR)).  Linear
    chain — each stage referenced once, so no need for the q113
    AS MATERIALIZED exponential-inline guard."""
    sql = f"WITH vocab AS ({vocab_sql}),\n"
    sql += (
        "t0 AS (SELECT word, list_transform(range(length(word)),"
        " i -> [word[i+1]]) AS toks FROM vocab WHERE length(word) > 0)"
    )
    prev = "t0"
    for k, (a, b) in enumerate(merges, start=1):
        aq, bq, mq = a.replace("'", "''"), b.replace("'", "''"), (a + b).replace("'", "''")
        wrap = (
            f"list_transform({prev}.toks, t -> [t])"
            if k > 1
            else f"{prev}.toks"
        )
        sql += (
            f",\nt{k} AS (SELECT word, list_reduce({wrap},"
            f" (acc, x) -> CASE WHEN acc[len(acc)] = '{aq}' AND x[1] = '{bq}'"
            f" THEN list_append(acc[1:len(acc)-1], '{mq}')"
            f" ELSE list_concat(acc, x) END) AS toks FROM {prev})"
        )
        prev = f"t{k}"
    sql += (
        f"\nSELECT word, array_to_string(toks, ' ') AS tokens,"
        f" CAST(len(toks) AS INTEGER) AS n_tokens FROM {prev}"
    )
    return sql
