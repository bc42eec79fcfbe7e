"""Join operators (SURVEY §2.5: J1-J6).

The reference's whole join surface is left outer equi-joins of a big fact
against small dims — broadcast-eligible by design.  ``lookup_dim``
captures the join+rename+drop pattern used for role-playing dims
(reference: src/jobs/load_fct_flights.py:58-90); ``check_fk`` replaces the
reference's left-join + null-count FK assert
(reference: src/jobs/load_dim_aircrafts.py:227-251) with a left-anti join.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lookup_dim(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    attach: Mapping[str, str],
    broadcast: bool = True,
    drop_fact_key: bool = True,
) -> DataFrame:
    """Attach dim attributes to a fact by a single-key left equi-join.

    ``attach`` maps {dim column -> output name}; only those dim columns are
    selected before the join (column pruning up front keeps the broadcast
    small).  ``broadcast=True`` (default) forces a broadcast-hash join:
    dims here are <<10 MB and at 100 TB fact scale a shuffle of the fact
    for a dim lookup is the single worst plan available.

    Role-playing dims (airports as departure AND arrival,
    reference: src/jobs/load_fct_flights.py:58-77) are two calls with
    different ``attach`` names.
    """
    dim_narrow = dim.select(dim_key, *attach.keys())
    for old, new in attach.items():
        dim_narrow = dim_narrow.withColumnRenamed(old, new)
    if broadcast:
        dim_narrow = F.broadcast(dim_narrow)
    joined = fact.join(dim_narrow, fact[fact_key] == dim_narrow[dim_key], "left")
    joined = joined.drop(dim_narrow[dim_key])
    if drop_fact_key:
        joined = joined.drop(fact_key)
    return joined


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side across all salt buckets, join on (key, salt).

    Use when one key value dominates the big side (AQE's skew-join split
    handles moderate skew automatically; salting is the explicit fix when
    a single key exceeds what one task can hold).  The small side grows
    ``salt_buckets``× — keep it broadcast-sized or lower the bucket count.
    The salt is derived from the row (xxhash64 of all columns), so the
    operator stays deterministic.

    Only big-side-preserving modes are allowed: under right/full outer an
    unmatched small-side row would survive once PER SALT REPLICA.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            "unmatched small-side rows once per salt bucket"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int")
    )
    small_replicated = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    joined = big_salted.join(
        small_replicated,
        on=(big_salted[big_key] == small_replicated[small_key])
        & (big_salted["_salt"] == small_replicated["_salt"]),
        how=how,
    )
    return joined.drop(big_salted["_salt"]).drop(small_replicated["_salt"])


@contextmanager
def runtime_bloom_pruning(
    spark: SparkSession,
    application_side_scan_threshold: str = "0",
    creation_side_threshold: str | None = None,
    disable_broadcast: bool = False,
) -> Iterator[None]:
    """Enable Catalyst's runtime Bloom-filter join pruning for plans
    BUILT AND EXECUTED inside the block.

    For a shuffle join where one side carries a selective predicate,
    Spark builds a Bloom filter over that side's join keys
    (``bloom_filter_agg``) and pushes a ``might_contain`` probe onto the
    big side's scan — rows that cannot match are dropped BEFORE the
    shuffle, the dominant cost of a fact-to-fact join at 100 TB.  The
    feature is on by default but gated by size thresholds tuned for
    clusters (application side must scan >10 GB); this context manager
    lowers them so the plan shape is testable — and restores every conf
    on exit.

    Laziness warning: confs are read when an ACTION runs the plan, not
    when the DataFrame is composed — materialize (collect / write /
    localCheckpoint) inside the block.

    ``disable_broadcast=True`` additionally sets
    ``autoBroadcastJoinThreshold=-1`` — the demo needs a shuffle join,
    which at test scale AQE would otherwise convert to broadcast (where
    a Bloom filter adds nothing: the probe side never shuffles).
    """
    confs: dict[str, str] = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_scan_threshold,
    }
    if creation_side_threshold is not None:
        confs[
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        ] = creation_side_threshold
    if disable_broadcast:
        confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    saved: dict[str, str | None] = {}
    for key, value in confs.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, value)
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def fk_orphans(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """J6 — rows of ``fact`` whose non-null key has no match in ``dim``.

    Left-anti join: map-side broadcast anti when dim is small, no fact
    shuffle.  NULL keys are not orphans (a left join would keep them with
    null dim attrs — same as the reference's semantics, which only counts
    nulls coming from the dim side after a left join).
    """
    return fact.filter(F.col(fact_key).isNotNull()).join(
        F.broadcast(dim.select(dim_key)),
        fact[fact_key] == dim[dim_key],
        "left_anti",
    )


def check_fk(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> None:
    """Assert referential integrity fact.key ⊆ dim.key (nulls exempt).

    Raises ``ValueError`` with an orphan sample, mirroring the reference's
    ``assert`` (src/jobs/load_dim_aircrafts.py:251) but with an anti-join
    instead of join-then-count-nulls.
    """
    orphans = fk_orphans(fact, fact_key, dim, dim_key)
    sample = orphans.select(fact_key).limit(5).collect()
    if sample:
        keys = [row[0] for row in sample]
        raise ValueError(
            f"FK violation: {fact_key} values missing in dim.{dim_key}, "
            f"e.g. {keys}"
        )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by,
    tolerance_s: int,
    direction: str = "both",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) row pairs in the same ``by`` group whose ``on``
    timestamps lie within ``tolerance_s`` seconds — the interval/range
    join (CDC reconciliation, nearby-event correlation), which Spark
    would otherwise plan as a nested-loop over the inequality predicate.

    ``direction``: "both" (|l - r| <= tol), "backward" (r in
    [l - tol, l]), "forward" (r in [l, l + tol]).

    Bucketed equi-join shape: both sides bucket their timestamp by the
    tolerance width; the right side EXPLODES to its own bucket ±1 so any
    qualifying pair shares an equi-key (by, bucket).  The join is then a
    plain hash equi-join — shuffle keyed on (by, bucket), never a
    nested-loop — and the exact inequality filters inside the bucket
    pairs.  Each qualifying pair matches on exactly ONE replicated
    bucket, so no dedup pass is needed.  Replication factor is a fixed
    3x on the right side regardless of data volume.
    """
    if direction not in ("both", "backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    by = list(by)
    width = int(tolerance_s) * 1_000_000  # microseconds

    lb = F.floor(F.unix_micros(F.col(on)) / width)
    l_side = left.withColumn("_b", lb)
    right_renamed = right.select(
        *by,
        F.col(on).alias(f"{on}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c != on and c not in by
        ],
    )
    rb = F.floor(F.unix_micros(F.col(f"{on}{suffix}")) / width)
    r_side = right_renamed.withColumn(
        "_b", F.explode(F.array(rb - 1, rb, rb + 1))
    )
    joined = l_side.join(r_side, on=by + ["_b"]).drop("_b")

    delta = F.unix_micros(F.col(f"{on}{suffix}")) - F.unix_micros(F.col(on))
    if direction == "both":
        cond = F.abs(delta) <= width
    elif direction == "backward":
        cond = (delta >= -width) & (delta <= 0)
    else:
        cond = (delta >= 0) & (delta <= width)
    return joined.filter(cond)


def partial_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    hot_share_pct: float = 1.0,
) -> DataFrame:
    """Skew join with PARTIAL salting: detect the hot keys first (the
    q150 ``key_skew_report`` probe — one map-side-combined count), then
    salt ONLY rows carrying a hot key; cold keys join plain.

    Why not salt everything (``salted_join``): blanket salting
    replicates the ENTIRE small side ``salt_buckets``× — at 100 TB the
    replication dwarfs the skew it fixes when only a handful of keys
    are hot.  Partial salting replicates only the small-side rows whose
    key is hot (hot-key-count × buckets rows), which is the shape AQE's
    skew-join split produces at runtime — made explicit, deterministic,
    and available to modes AQE won't rewrite.

    The hot-key set is collected to the driver (bounded: keys above
    ``hot_share_pct`` percent of the big side — at most
    ``100/hot_share_pct`` keys can exist) and broadcast back inside a
    literal ``isin``; the two sub-joins (hot salted, cold plain) union.
    Semantically invisible: same rows as a plain equi-join (oracle-
    gated).  Big-side-preserving modes only, as ``salted_join``.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"partial_salted_join supports {sorted(allowed)}; {how!r} would "
            "duplicate unmatched small-side rows once per salt bucket"
        )
    counts = big.groupBy(big_key).agg(F.count("*").alias("_cnt"))
    total = big.count()
    threshold = int(total * hot_share_pct / 100.0)
    hot_keys = [
        r[big_key]
        for r in counts.filter(F.col("_cnt") > threshold).collect()
    ]
    if not hot_keys:
        return big.join(
            small, on=big[big_key] == small[small_key], how=how
        )

    big_hot = big.filter(F.col(big_key).isin(hot_keys))
    big_cold = big.filter(
        ~F.col(big_key).isin(hot_keys) | F.col(big_key).isNull()
    )
    small_hot = small.filter(F.col(small_key).isin(hot_keys))

    hot_joined = salted_join(
        big_hot, small_hot, big_key, small_key, how=how,
        salt_buckets=salt_buckets,
    )
    cold_joined = big_cold.join(
        small, on=big_cold[big_key] == small[small_key], how=how
    )
    return hot_joined.unionByName(cold_joined)
