"""Deduplication operators for training-data pipelines.

Four tiers, all partition-parallel (no global sorts, no driver collects):

- exact:   hash-groupBy on a canonical fingerprint (md5)
- minhash: MinHash signatures + LSH banding -> candidate pairs -> verify
- simhash: 64-bit sign-of-sum fingerprint, near-dup = small Hamming distance
- n-gram Jaccard: exact set-similarity self-join on shared tokens

Scale notes: every self-join here goes through an equi-key (fingerprint,
band hash, token) so Spark shuffles on that key only.  The token/band
join is the classic candidate-generation trick from MinHash-LSH (Broder
'97 / Leskovec et al., Mining of Massive Datasets ch.3): quadratic
verification happens only inside buckets, never across the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.functions.text import fingerprint_md5, tokenize, word_shingles


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per exact (canonicalized) text: the min id wins.

    groupBy on the md5 fingerprint — shuffles the (fingerprint, id) pairs
    only, never the full rows; winners join back to recover payloads.
    """
    fp = df.select(
        F.col(id_col), fingerprint_md5(F.col(text_col)).alias("_fp")
    )
    winners = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return df.join(winners.select(id_col), on=id_col, how="left_semi")


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — MinHash over word ``shingle_n``-grams.

    Hash family: xxhash64(shingle, seed_i) for i in 0..num_hashes-1 —
    deterministic, JVM-side, no UDF.  One explode + one groupBy (shuffle
    on id), signature built by ``num_hashes`` min-aggregates.
    """
    shingled = df.select(
        F.col(id_col),
        F.explode_outer(word_shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    sig = shingled.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 8,
    sig_col: str = "signature",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from LSH banding.

    Signature length must divide evenly into ``num_bands``; a pair is a
    candidate when any band's row-slice hashes equal.  Self-join is on
    (band index, band hash) — the shuffle key is the bucket, so skew only
    occurs when a bucket is genuinely hot (near-identical corpus slices).
    """
    bands = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                # slice the signature into num_bands equal chunks and hash each
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col(sig_col),
                                b * (F.size(F.col(sig_col)) / num_bands).cast("int") + 1,
                                (F.size(F.col(sig_col)) / num_bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("_band", "_bh"),
    )
    left = bands.select(
        F.col(id_col).alias("id_a"), F.col("_band"), F.col("_bh")
    )
    right = bands.select(
        F.col(id_col).alias("id_b"), F.col("_band"), F.col("_bh")
    )
    return (
        left.join(right, on=["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def estimate_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash Jaccard estimate: fraction of equal signature positions."""
    eq = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x)
    )
    return eq / F.size(sig_a)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over tokens (Charikar '02).

    Each token hashes to 64 bits; bit b of the fingerprint is the sign of
    sum(±1 over tokens by their bit b).  Implemented as explode + 64
    conditional sums + bit reassembly — all JVM expressions, one shuffle
    on id.
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(tokenize(F.col(text_col))).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("_t").isNull(), F.lit(0)).otherwise(
                    F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                )
            ).alias(f"_b{b}")
            for b in range(64)
        ]
    )
    fingerprint = None
    for b in range(64):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return bit_sums.select(F.col(id_col), fingerprint.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 1,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram-set Jaccard similarity pairs (id_a < id_b, jaccard).

    Inverted-index self-join: explode distinct n-grams, join on the n-gram
    (shuffle key = token — candidate pairs only where sets intersect),
    count intersections, compute |A∪B| from per-doc set sizes.  At corpus
    scale, prune hot tokens (df-frequency cap) before the self-join.
    """
    grams_col = (
        tokenize(F.col(text_col)) if n == 1 else word_shingles(F.col(text_col), n)
    )
    grams = df.select(F.col(id_col), F.explode(grams_col).alias("_g")).distinct()
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("_sz"))

    a = grams.select(F.col(id_col).alias("id_a"), "_g")
    b = grams.select(F.col(id_col).alias("id_b"), "_g")
    inter = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"))
    out = (
        inter.join(F.broadcast(sz_a), "id_a")
        .join(F.broadcast(sz_b), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")
