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

from pyspark.sql import DataFrame
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
