"""Text-analysis column functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs in any hot path.  Operate on the ``documents`` table shape
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "ich", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "pas", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "no"],
}


def tokenize(col: Column) -> Column:
    """Whitespace tokenization to a lowercase token array."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokenize(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND between letter/
    digit/punctuation class changes — a cheap, deterministic proxy for BPE
    token counts (≈ chars/4 heuristics are worse).  Pure regex, JVM-side.
    """
    pieces = F.split(
        F.trim(col), r"(\s+|(?<=[a-zA-Z])(?=[^a-zA-Z\s])|(?<=[^a-zA-Z\s])(?=[a-zA-Z]))"
    )
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters (quality signal)."""
    total = F.length(col)
    alpha = total - F.length(F.regexp_replace(col, "[a-zA-Z]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(alpha / total)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation."""
    total = F.length(col)
    punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[\.,;:!\?'\"()\[\]{}-]", "")
    )
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(col: Column, stopwords: Sequence[str]) -> Column:
    """Fraction of tokens that are in ``stopwords`` (0 for empty text)."""
    toks = tokenize(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.length(F.trim(col)) == 0, F.lit(0.0)).otherwise(
        hits / F.size(toks)
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length, alpha ratio, stopword
    presence.  Deterministic; weights are arbitrary but fixed."""
    length_score = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.4) * alpha_ratio(col)
        + F.lit(0.2) * stopword_ratio(col, STOPWORDS["en"])
    )


def lang_id(col: Column) -> Column:
    """Stopword-hit language ID: argmax language by stopword-token hits,
    'und' (undetermined) when no list scores > 0.  Ties break by language
    code order (deterministic)."""
    toks = tokenize(col)
    def _in_list(words):
        # single-param lambda factory: pyspark's higher-order-function shim
        # passes one arg per named parameter, so default-arg capture breaks
        return lambda t: t.isin(*words)

    scored = None
    for code in sorted(STOPWORDS):
        hits = F.size(F.filter(toks, _in_list(STOPWORDS[code])))
        entry = F.struct(hits.alias("hits"), F.lit(code).alias("code"))
        scored = F.array(entry) if scored is None else F.concat(scored, F.array(entry))
    # argmax by (hits desc, code asc) — comparator sort, take head
    best_desc = F.array_sort(
        scored,
        lambda a, b: F.when(a["hits"] > b["hits"], F.lit(-1))
        .when(a["hits"] < b["hits"], F.lit(1))
        .otherwise(
            F.when(a["code"] < b["code"], F.lit(-1))
            .when(a["code"] > b["code"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )[0]
    return F.when(best_desc["hits"] > 0, best_desc["code"]).otherwise(F.lit("und"))


def fingerprint_md5(col: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased, trimmed,
    whitespace-collapsed text.  md5 (not xxhash64) so external engines can
    reproduce it."""
    canon = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(canon)


def fingerprint_rolling(
    col: Column, base: int = 31, mod: int = 1_000_000_007
) -> Column:
    """Polynomial rolling hash (Rabin-Karp form) over codepoints:
    ``h = fold(h*base + codepoint) mod m``.

    Unlike md5 this is incrementally maintainable (append a char = one
    multiply-add), which is what chunk/window fingerprinting pipelines
    want.  Pure integer arithmetic in JVM expressions — cross-engine
    reproducible bit-for-bit (DuckDB ``list_reduce``; verified incl.
    non-ASCII and surrogate-pair codepoints).  Keep ``mod`` below
    2^63 / (base + max_codepoint) so the fold never overflows signed 64.
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(base) + F.ascii(ch)) % F.lit(mod),
    )


#: PII-ish redaction patterns — kept to RE2-compatible syntax (no
#: lookaround) so external engines can replay the exact same scrub
REDACTION_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}",
}

#: deterministic application order: emails first (their dots would
#: otherwise feed the ipv4 pattern), then IPs (so the dotted quads are
#: gone before the phone pattern — whose separator class includes '.' —
#: can munch them), then phones
REDACTION_ORDER = ["email", "ipv4", "phone"]


def redact_pii(col: Column, kinds=None, token: str = "[REDACTED]") -> Column:
    """Scrub PII-shaped substrings (emails, IPv4 addresses, phone
    numbers) with a fixed token — the pre-training scrub pass.  Pure
    ``regexp_replace`` chain (JVM-side, global replace); patterns avoid
    lookaround so the scrub is reproducible in RE2-based engines.
    Pattern order is fixed (see ``REDACTION_ORDER``) because the
    patterns' character classes overlap."""
    out = col
    for kind in kinds if kinds is not None else REDACTION_ORDER:
        out = F.regexp_replace(out, REDACTION_PATTERNS[kind], token)
    return out


def dup_line_ratio(col: Column) -> Column:
    """Fraction of non-blank lines that are repeats of an earlier line —
    the Gopher-style repetition signal (Rae et al. '21 §A1.1) for
    boilerplate/navigation pages.  Pure per-row array expressions, no
    shuffle; 0.0 for empty or single-line text."""
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines)
    return F.when(n_lines == 0, F.lit(0.0)).otherwise(
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    )


def top_ngram_fraction(shingles: Column) -> Column:
    """Fraction of n-gram occurrences taken by the single most frequent
    n-gram (Gopher repetition signal: a high value means one phrase
    dominates the document).

    Takes a MATERIALIZED shingle array column (``word_shingles`` output
    stored via ``withColumn`` first): Catalyst does no CSE across
    higher-order-function lambda boundaries, so passing the raw
    expression would re-tokenize per lambda.  Per-row O(k·d) over k
    shingles / d distinct — row-local, no shuffle."""
    counts = F.transform(
        F.array_distinct(shingles),
        lambda s: F.size(F.filter(shingles, lambda x: x == s)),
    )
    return F.when(F.size(shingles) == 0, F.lit(0.0)).otherwise(
        F.array_max(counts) / F.size(shingles)
    )


def dup_ngram_fraction(shingles: Column) -> Column:
    """Fraction of n-gram occurrences whose n-gram appears more than once
    in the document (the companion Gopher duplicate-n-gram signal).
    Same materialized-column contract as ``top_ngram_fraction``."""
    dup_occurrences = F.size(
        F.filter(
            shingles,
            lambda x: F.size(F.filter(shingles, lambda y: y == x)) > 1,
        )
    )
    return F.when(F.size(shingles) == 0, F.lit(0.0)).otherwise(
        dup_occurrences / F.size(shingles)
    )


def word_shingles(col: Column, n: int) -> Column:
    """Array of word n-gram shingles (space-joined), empty array when the
    text has fewer than ``n`` tokens — or is NULL.

    The fence is spelled ``when(size >= n)`` POSITIVELY: for NULL text
    ``size(tokenize(NULL))`` is NULL, so the previous ``when(size < n)``
    fence fell through to the otherwise-branch, where
    ``greatest(NULL, 0) = 0`` made ``sequence(1, 0)`` DESCEND and
    fabricate two phantom ``''`` shingles per NULL document (ADVICE
    r11; the row shape ``word_shingle_rows`` was fixed in round 11 —
    this aligns every remaining array-form caller with it)."""
    toks = tokenize(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def word_shingle_rows(
    df, id_col: str, text_col: str, n: int, distinct: bool = False
):
    """``(id_col, _g)`` — ONE ROW per word ``n``-gram shingle, byte-
    identical to ``explode(word_shingles(text, n))`` (plus per-document
    dedup when ``distinct=True``, matching
    ``explode(array_distinct(word_shingles(...)))``).

    Shape note (round-11 optimization, guide §4.1): the array form runs
    ``transform(idx, i -> concat_ws(slice(toks, i, n)))`` — an
    INTERPRETED per-element lambda that also copies an ``n``-token
    subarray per shingle; measured 2.4 s to explode a 3.5 k-doc corpus.
    This shape explodes the shingle INDEX instead and assembles each
    shingle from ``element_at`` + ``concat_ws`` — plain whole-stage-
    codegen expressions, 0.3 s on the same corpus, output multiset
    verified identical.  ``distinct=True`` spells the per-document
    array_distinct as ``dropDuplicates`` — a shuffle, but every caller
    that needs distinct gram rows immediately shuffles them anyway
    (size aggregates / gram joins), and the callers checkpoint the
    gram table so the distinct runs once.

    Guard: ``sequence(1, stop)`` DESCENDS when ``stop < 1`` (yielding
    phantom indexes), so documents with fewer than ``n`` tokens are
    fenced to an empty index array — same no-rows contract as the
    array form.  ``n == 1`` short-circuits to ``explode(tokenize)``
    (no index machinery needed; single tokens are the shingles)."""
    if n == 1:
        rows = df.select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_g")
        )
    else:
        toks = tokenize(F.col(text_col))
        idx = F.when(
            F.size(toks) >= n,
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        rows = (
            df.select(F.col(id_col), toks.alias("_tk"), idx.alias("_ix"))
            .select(F.col(id_col), "_tk", F.explode("_ix").alias("_i"))
            .select(
                F.col(id_col),
                F.concat_ws(
                    " ",
                    *[
                        F.element_at("_tk", F.col("_i") + k)
                        for k in range(n)
                    ],
                ).alias("_g"),
            )
        )
    return rows.dropDuplicates([id_col, "_g"]) if distinct else rows


def chunk_documents(
    docs,
    id_col: str,
    text_col: str,
    window: int,
    stride: int | None = None,
):
    """Split each document's whitespace token stream into (possibly
    overlapping) windows of ``window`` tokens advancing by ``stride``
    (default: ``window``, i.e. disjoint) — the context-window
    preparation step of a training pipeline (overlap preserves
    cross-boundary continuations).

    Returns ``(id_col, chunk_idx, chunk_text, chunk_tokens)`` with one
    row per chunk; a document with fewer than ``window`` tokens yields
    one short chunk, blank documents yield none.

    Scale: tokenize → ``posexplode`` over the window-start sequence is
    per-row narrow work — NO shuffle, no UDF; output size is
    ``ceil(n/stride)`` rows per doc.  The exploded chunk text is
    materialized once per chunk (bounded by ``window``), never the full
    token array per chunk.
    """
    if stride is None:
        stride = window
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokenize(F.col(text_col))
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(stride)).cast("array<int>")
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, window)
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("chunk_tokens"),
    )


def bm25_scores(
    docs,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every document against a small bag of query
    terms (Robertson/Sparck-Jones idf, Lucene's +1 smoothing) — the
    keyword-retrieval primitive for corpus curation and eval-set
    mining.

    Two passes, both scale-sane at 100 TB:
    1. ONE map-side-combined aggregate computes N, avgdl, and per-term
       document frequencies as |Q|+2 scalars (array_contains flags —
       the corpus is never exploded or shuffled for stats).
    2. A narrow per-row pass scores each doc: tf via row-local
       ``F.size(F.filter(...))``, idf folded in as a Python literal.
       No shuffle anywhere; only docs matching ≥1 term are returned.

    Determinism: avgdl is an exact bigint-sum / count division and the
    per-term additions follow the fixed ``query_terms`` order, so the
    float result is reproducible across engines modulo ln() ULPs.
    """
    import math

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokenize(F.col(text_col))
    dl = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    stats = docs.agg(
        F.count("*").alias("_n"),
        F.avg(dl).alias("_avgdl"),
        *[
            F.sum(
                F.when(F.array_contains(toks, F.lit(t)), 1).otherwise(0)
            ).alias(f"_df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ).first()
    n_docs, avgdl = stats["_n"], stats["_avgdl"]
    score = None
    for i, t in enumerate(query_terms):
        df_t = stats[f"_df_{i}"]
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t)))
        contrib = (
            F.lit(idf)
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * dl / F.lit(avgdl)))
        )
        score = contrib if score is None else score + contrib
    matched = None
    for t in query_terms:
        hit = F.when(F.array_contains(toks, F.lit(t)), 1).otherwise(0)
        matched = hit if matched is None else matched + hit
    return docs.select(
        F.col(id_col),
        matched.alias("matched_terms"),
        score.alias("bm25"),
    ).filter(F.col("matched_terms") > 0)


def vocab_coverage(
    docs: DataFrame,
    text_col: str,
    coverage_pct: int = 90,
) -> DataFrame:
    """How many distinct tokens cover ``coverage_pct``% of all token
    occurrences — the corpus statistic behind vocabulary sizing and
    tokenizer budgeting.  Returns one row:
    ``(vocab_size_at_pct, total_tokens, vocab_size)``.

    Frequencies come from one map-side-combined aggregate; the global
    cumulative walk down the frequency-sorted vocabulary reuses
    ``take_until_budget``'s distributed prefix sum (range buckets +
    driver bucket offsets) — the vocabulary is never serialized through
    a single-partition window.  Counts are strictly positive, so the
    cumulative sum is strictly increasing and the boundary rank is
    exact integer arithmetic: hash-stable across engines.
    """
    from pyspark.sql import functions as F

    from etl_opensky_spark.functions.sampling import take_until_budget

    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_tok")
    ).filter(F.col("_tok") != "")
    freq = toks.groupBy("_tok").agg(F.count("*").alias("_cnt"))
    total, vocab = freq.agg(
        F.sum("_cnt"), F.count("*")
    ).collect()[0]  # two driver scalars
    target = (coverage_pct * int(total) + 99) // 100  # ceil(pct% of total)
    # strictly increasing cumsum: ranks with cum <= target-1 are exactly
    # the ranks BELOW the first rank whose cum reaches the target
    below = take_until_budget(
        freq, order_col="_cnt", key_col="_tok", weight_col="_cnt",
        budget=target - 1,
    )
    return below.agg(
        (F.count("*") + 1).alias("vocab_size_at_pct"),
        F.lit(int(total)).alias("total_tokens"),
        F.lit(int(vocab)).alias("vocab_size"),
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str, top_n: int = 50
) -> DataFrame:
    """One BPE training step, distributed: count adjacent character
    pairs across the corpus and return the ``top_n`` most frequent —
    the pair a byte-pair-encoding tokenizer trainer would merge next
    (Sennrich et al., 2016).

    The 100 TB shape: the corpus is first collapsed to a DISTINCT-WORD
    frequency table (one word-count aggregate — vocabulary grows ~
    Heaps' law, sublinearly in corpus size), and the character-pair
    explosion runs over distinct words only, weighted by frequency.
    Exploding pairs over raw tokens would fan out O(corpus chars);
    this fans out O(vocab chars) — orders of magnitude less data
    through the second aggregate at trillion-token scale.

    Pure integer counts, deterministic (ties at the top_n boundary
    break on the pair string), zero UDFs.
    """
    from pyspark.sql import DataFrame as _DF  # noqa: F401 (signature doc)

    words = docs.select(
        F.explode(tokenize(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    word_freq = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = word_freq.filter(F.length("w") >= 2).select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("freq").cast("bigint").alias("n_occurrences")
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("pair")
    ).limit(top_n)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Per-document top-``top_k`` terms by tf-idf — the classic corpus
    keyword extractor (and the sparse sibling of the dense embedding
    path).  Returns ``(id, term, tf, tfidf_micros, term_rank)``.

    idf = ln(N / df) is micro-quantized ONCE per term (the DSIR rule),
    so per-doc scores ``tf · idf_micros`` are exact integers — rank
    order is engine-exact with deterministic (score desc, term asc)
    ties.  ``min_df`` prunes hapax noise the way real pipelines do.

    Scale shape: ONE (doc, term) count aggregate over the exploded
    corpus (map-side combined word-count), persisted and reused for the
    term-level df aggregate AND the scoring join — the corpus is
    scanned once (without the persist, Catalyst does NOT reuse the
    exchange: the two consumers prune different columns and the
    subtrees stop being identical; measured, not guessed).  At real
    scale the persisted (doc, term) table is the thing you would
    checkpoint to parquet between pipeline stages.  Then an equi-join
    of doc-distinct terms to the df table and a per-doc top-k window
    partitioned BY DOCUMENT — bounded partitions, never a global sort.
    """
    from pyspark.sql.window import Window as _W

    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    doc_tf = toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    ).localCheckpoint(eager=True)  # released on RDD GC, unlike a bare persist
    df_tbl = doc_tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).distinct().count()  # one scalar job
    idf = df_tbl.filter(F.col("df") >= min_df).select(
        "term",
        F.round(
            F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            * 1_000_000.0
        )
        .cast("bigint")
        .alias("idf_micros"),
    )
    scored = doc_tf.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        (F.col("tf") * F.col("idf_micros")).cast("bigint").alias(
            "tfidf_micros"
        ),
    )
    w = _W.partitionBy(id_col).orderBy(
        F.col("tfidf_micros").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select(id_col, "term", "tf", "tfidf_micros",
                F.col("term_rank").cast("int").alias("term_rank"))
    )


def hashed_feature_weight(token: Column, scale: int = 1000) -> Column:
    """Deterministic integer weight in [-scale, scale] for a feature
    string: first 4 md5 hex digits mod (2·scale+1), shifted.  The
    hashing-trick weight lookup any engine can replay (same md5 idiom as
    ``sampling.hash_bucket``) — stands in for a trained weight table; a
    real model swaps this expression for a broadcast weight-table join
    without touching the scoring shape."""
    h = F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("int")
    return h % (2 * scale + 1) - scale


def hashed_linear_score(col: Column, scale: int = 1000) -> Column:
    """fastText-style linear text scorer, zero-shuffle: tokenize, build
    unigram + bigram features, sum each feature's hashed weight.  The
    entire scorer is ONE Column expression per row (codegen'd, no
    explode — the feature array never leaves the row), so scoring a
    100 TB corpus is a map-only pass.  Integer sum → exact in any
    engine; classify on the sign."""
    toks = tokenize(col)
    n_1 = F.greatest(F.size(toks) - 1, F.lit(0))
    # both sides sliced to n-1: zip_with NULL-pads the shorter array, which
    # would fabricate a trailing pseudo-bigram from the last unigram
    bigrams = F.zip_with(
        F.slice(toks, 1, n_1),
        F.slice(toks, 2, n_1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    uni_w = F.aggregate(
        F.transform(toks, lambda t: hashed_feature_weight(t, scale)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    bi_w = F.aggregate(
        F.transform(bigrams, lambda t: hashed_feature_weight(t, scale)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return uni_w + bi_w


def remove_boilerplate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
    min_doc_freq: int = 3,
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every fixed-width word
    chunk that appears in ≥ ``min_doc_freq`` DISTINCT documents, then
    reassemble each document from its surviving chunks (original
    order).  Returns ``(id, clean_text, n_chunks, n_removed)``.

    Scale shape (the corpus is the 100 TB input here):

    - chunking is a pure Column expression — ``transform`` over
      ``sequence`` slicing the word array — so nothing explodes until
      the chunk level (corpus_words / chunk_words rows, ~1/8 of the
      token count);
    - the document-frequency pass is a (chunk-hash → distinct-doc
      count) aggregate with map-side combine; only hashes, never chunk
      text, are shuffled;
    - the boilerplate set (df ≥ threshold) is small by construction —
      it's the *common* content — and drives a broadcast LEFT ANTI
      join against the exploded chunks;
    - reassembly is one groupBy per document with an in-row
      ``array_sort`` on (position, chunk) structs — no window, no
      per-doc task.

    Chunks are compared exactly (md5 of the chunk text); the last chunk
    of a document may be shorter than ``chunk_words``.
    """
    arr = F.split(F.col(text_col), " ")
    nch = F.greatest(
        F.ceil(F.size(arr) / F.lit(chunk_words)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(
            F.slice(arr, i * chunk_words + 1, chunk_words), " "
        ),
    )
    exploded = (
        df.select(
            F.col(id_col), F.posexplode(chunks).alias("_cpos", "_chunk")
        )
        .withColumn("_h", F.md5(F.col("_chunk")))
        # three consumers (df-count pass, anti-join probe, per-doc totals):
        # without materialization the chunking explode re-runs per consumer
        # (q112 exchange-reuse lesson).  Eager localCheckpoint, not persist:
        # a lazy persist on a returned-DataFrame subtree has no release
        # path in a long-lived session (ADVICE r4); checkpoint storage
        # frees on RDD GC.
        .localCheckpoint(eager=True)
    )

    common = (
        exploded.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_h")
    )
    kept = exploded.join(F.broadcast(common), "_h", "left_anti")

    n_kept = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_cpos", "_chunk"))),
                lambda s: s["_chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("_n_kept"),
    )
    totals = exploded.groupBy(id_col).agg(
        F.count("*").alias("n_chunks")
    )
    return (
        totals.join(n_kept, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_chunks").cast("int").alias("n_chunks"),
            (F.col("n_chunks") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )
