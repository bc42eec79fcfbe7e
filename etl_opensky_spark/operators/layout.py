"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference's lake layout is 1-D hive partitioning on flight date
(src/jobs/load_fct_flights.py partition columns); min/max data skipping
then only helps date predicates.  Z-ordering interleaves the bits of
TWO (or more) columns into one sort key so a range-sorted write gives
every file a tight min/max envelope on *both* dimensions — the layout
behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — and parquet row-group
pruning then serves either predicate.

Scale shape: the z-value is a pure per-row bit expression (whole-stage
codegen, zero shuffles); the clustered write is ONE
``repartitionByRange`` shuffle on the z-value — the same cost as any
sorted write — and file count is explicit.  No driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension; 2 dims -> 32-bit z-value


def _clamp16(col: Column) -> Column:
    """Clamp a non-negative integral column into [0, 2^16)."""
    v = col.cast("bigint")
    return F.least(F.greatest(v, F.lit(0)), F.lit((1 << ZBITS) - 1))


def zorder_value(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two clamped ``bits``-wide ints: bit ``i`` of
    ``x`` lands at position ``2i``, of ``y`` at ``2i+1``.  The
    interleave itself is ``sinks.zorder_key`` (the generic n-column
    form used by ``write_parquet_zordered``/q75); this wrapper adds the
    domain clamp and the fixed 2-D oracle-replayable contract."""
    from etl_opensky_spark.sources.sinks import zorder_key

    return zorder_key([_clamp16(x), _clamp16(y)], bits)


def zorder_value_multi(
    cols: list[Column], bits: int | None = None
) -> Column:
    """N-dimensional Morton key (``OPTIMIZE ZORDER BY c1, ..., ck``):
    clamp each column into ``[0, 2^bits)`` and interleave.  ``bits``
    defaults to the widest per-dimension width that keeps the full key
    inside a SIGNED 64-bit long (``min(16, 63 // k)`` — a term at bit
    63 would flip the key negative and break the range sort), so 2
    dims keep the 16-bit contract of :func:`zorder_value`, 3 dims get
    16, 4 dims 15, 8 dims 7."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value_multi: need >= 2 columns")
    b = bits if bits is not None else min(ZBITS, 63 // n)
    from etl_opensky_spark.sources.sinks import zorder_key

    def clamp(col: Column) -> Column:
        v = col.cast("bigint")
        return F.least(F.greatest(v, F.lit(0)), F.lit((1 << b) - 1))

    return zorder_key([clamp(c) for c in cols], b)


def zorder_value_sql(x_expr: str, y_expr: str, bits: int = ZBITS) -> str:
    """The identical unrolled interleave as ANSI SQL (oracle/DuckDB
    replay) over pre-clamped integer expressions.  Every term is fully
    parenthesized: Postgres-lineage engines give ``<<``/``&``/``|``
    EQUAL precedence (left-to-right), so an unparenthesized mix
    evaluates in source order, not C order."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 8,
    z_col: str = "_z",
) -> None:
    """Z-clustered parquet write: range-partition on the interleaved
    key (one shuffle), sort within partitions, one file per partition.
    Readers filtering on EITHER source column prune most files via
    parquet min/max stats."""
    (
        df.withColumn(z_col, zorder_value(F.col(x_col), F.col(y_col)))
        .repartitionByRange(n_files, z_col)
        .sortWithinPartitions(z_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_envelope_report(
    spark, path: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-file min/max envelopes for two columns of a parquet dataset —
    the data-skipping effectiveness report.  Uses the file name from
    ``input_file_name`` grouping; envelope AREA relative to the global
    domain is the locality metric a Z-ordered layout shrinks."""
    df = spark.read.parquet(path).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return df.groupBy("_file").agg(
        F.min(x_col).alias("x_min"),
        F.max(x_col).alias("x_max"),
        F.min(y_col).alias("y_min"),
        F.max(y_col).alias("y_max"),
        F.count("*").alias("n_rows"),
    )
