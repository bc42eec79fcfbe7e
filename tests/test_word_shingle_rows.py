"""Round-11 optimization: exploded-index shingle rows
(text.word_shingle_rows) must be multiset-identical to the array form
``explode([array_distinct(]word_shingles(text, n)[)])`` — including the
short-document fence (``sequence(1, stop)`` DESCENDS when ``stop < 1``,
which would fabricate phantom index rows without the guard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_opensky_spark.functions.text import word_shingle_rows, word_shingles


def _corpus(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c a b c a b"),     # repeated shingles -> distinct matters
        (3, "one two"),              # fewer than 3 tokens -> NO rows (n=3)
        (4, "solo"),                 # single token
        (5, ""),                     # empty text
        (7, "  padded   text  here  "),  # trim + multi-space split
        (8, "x " * 500),             # long doc
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _array_form(df, n, distinct):
    sh = word_shingles(F.col("text"), n)
    if distinct:
        sh = F.array_distinct(sh)
    return df.select("doc_id", F.explode(sh).alias("_g"))


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_multiset_identical_nondistinct(spark):
    df = _corpus(spark)
    for n in (2, 3, 5):
        _assert_same(
            word_shingle_rows(df, "doc_id", "text", n),
            _array_form(df, n, distinct=False),
        )


def test_multiset_identical_distinct(spark):
    df = _corpus(spark)
    for n in (2, 3):
        _assert_same(
            word_shingle_rows(df, "doc_id", "text", n, distinct=True),
            _array_form(df, n, distinct=True),
        )


def test_short_docs_yield_no_rows(spark):
    # the sequence-descend hazard: docs with < n tokens must produce
    # ZERO rows, not phantom index rows
    df = _corpus(spark).filter(F.col("doc_id").isin(3, 4, 5))
    assert word_shingle_rows(df, "doc_id", "text", 3).count() == 0


def test_null_text_yields_no_rows(spark):
    # NULL text: the ARRAY form had a latent sequence-descend bug —
    # size(NULL tokens) is NULL, the < n fence passes NULL (falsy), and
    # greatest(NULL, 0)=0 makes sequence(1, 0) DESCEND, fabricating two
    # phantom '' shingles that would pair every NULL doc with every
    # other.  The row shape (and every SQL oracle replay, where
    # len(NULL) never enters the range) yields NO rows — pinned here.
    df = spark.createDataFrame([(6, None)], "doc_id int, text string")
    for n in (2, 3):
        assert word_shingle_rows(df, "doc_id", "text", n).count() == 0
        assert (
            word_shingle_rows(df, "doc_id", "text", n, distinct=True).count()
            == 0
        )


def test_array_form_null_text_yields_empty_array(spark):
    # round 12 (ADVICE r11): the ARRAY form itself is fence-fixed — the
    # positive when(size >= n) guard sends NULL text to the empty-array
    # branch, so the remaining array-form callers (pandas minhash,
    # Gopher fractions) see zero shingles, matching word_shingle_rows
    df = spark.createDataFrame(
        [(6, None), (3, "one two"), (1, "a b c d")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert got[6] == []          # NULL text: no phantom '' shingles
    assert got[3] == []          # short doc: unchanged
    assert got[1] == ["a b c", "b c d"]


def test_n1_tokens(spark):
    df = _corpus(spark).filter(F.col("doc_id").isin(1, 2, 7))
    got = word_shingle_rows(df, "doc_id", "text", 1)
    ref = df.select("doc_id", F.explode(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("_g"))
    _assert_same(got, ref)
