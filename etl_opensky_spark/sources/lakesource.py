"""``versioned`` — the lake as a Spark 4 Python batch data source with
PUSHDOWN-DRIVEN FILE SKIPPING.

``spark.read.format("versioned").option("asOf", v).load(base)`` reads a
snapshot of the versioned table through the Python Data Source API:

- **pushFilters → planning-time pruning**: equality/range predicates on
  stats-harvested columns prune against the commit manifest's per-file
  min/max (the same `_file_matches` rule as ``prune_files``), and
  equality on partition columns prunes partition DIRECTORIES by path —
  both happen on the driver before any task launches, so a selective
  query plans tasks for only the files that can match.  Every filter is
  returned as UNSUPPORTED, so Spark re-applies them post-scan: pruning
  is purely a cost lever, never a correctness dependency.
- **one InputPartition per data file**, pyarrow decode on executors.
- full snapshot semantics: time travel (``asOf``), column mapping
  (physical file names → logical), schema evolution (files predating an
  added column emit nulls), and merge-on-read tombstones — including
  FILE-SCOPED ones (the sidecar's key list + scope ride into each
  file's partition as driver-collected payload; tombstone sidecars are
  small by design).

This is the "integrate the table format with the engine's source API"
step Delta/Iceberg take with their DataSource V2 relations, expressed
through the Python API.  The Catalyst path (``read_version``) remains
the default — whole-stage codegen beats per-row Python — but this
source gives non-JVM consumers and the DS API ecosystem the same
snapshot + skipping semantics through one interface.
"""

from __future__ import annotations

import datetime
import os
import re

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

from etl_opensky_spark.sources.versioned import (
    TOMB_SCOPE,
    _col_mapping,
    _file_matches,
    _resolve,
    _snapshot_files,
)

_HIVE_ESC = re.compile(r"%([0-9A-Fa-f]{2})")


def _unescape_hive(value: str) -> str:
    """Invert Hive's %XX directory-name escaping (space is written
    raw)."""
    return _HIVE_ESC.sub(lambda m: chr(int(m.group(1), 16)), value)


def _partition_values(rel: str) -> dict[str, str]:
    """``c1=v1/c2=v2/part-x.parquet`` → {c1: v1, c2: v2} (unescaped)."""
    out: dict[str, str] = {}
    for seg in rel.split("/")[:-1]:
        name, eq, raw = seg.partition("=")
        if eq:
            out[name] = _unescape_hive(raw)
    return out


def _cast_partition(value: str, dtype) -> object:
    if isinstance(dtype, (IntegerType, LongType, ShortType)):
        return int(value)
    if isinstance(dtype, StringType):
        return value
    if isinstance(dtype, DateType):
        return datetime.date.fromisoformat(value)
    raise ValueError(
        f"versioned source: unsupported partition column type {dtype}"
    )


def _arrow_to_spark(t):
    """Arrow type -> Spark DataType object (no SparkContext needed —
    the DDL parser is a JVM call and the DS planning process has
    none).  Covers the lake's writable types."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if pa.types.is_int8(t):
        return T.ByteType()
    if pa.types.is_int16(t):
        return T.ShortType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_timestamp(t):
        return T.TimestampType()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.ArrayType(_arrow_to_spark(t.value_type))
    raise ValueError(f"versioned source: unmapped arrow type {t}")


def _read_tombstones(base: str, entry: dict) -> list[dict]:
    """Driver-side tombstone payloads: ``{keys: [...], key_cols,
    scope: set|None}`` per sidecar — small by design (a MOR delete
    records KEYS, not rows)."""
    import json

    import pyarrow.parquet as pq

    out = []
    for t in entry.get("tombstones") or []:
        tdir = os.path.join(base, entry["dir"], t["dir"])
        table = pq.read_table(tdir)
        keys = set(zip(*(c.to_pylist() for c in table.columns)))
        scope = None
        if t.get("scoped"):
            with open(os.path.join(tdir, TOMB_SCOPE)) as fh:
                scope = set(json.load(fh))
        out.append({"key_cols": list(t["keys"]), "keys": keys,
                    "scope": scope})
    return out


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        InputPartition,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
    )

    class _LakeFilePartition(InputPartition):
        def __init__(self, path: str, rel: str):
            self.path = path
            self.rel = rel

    class VersionedLakeReader(DataSourceReader):
        def __init__(self, options: dict, schema: StructType):
            base = options.get("path")
            if not base:
                raise ValueError(
                    "versioned source: pass the table base via .load(dir)"
                )
            as_of = options.get("asof")  # option keys arrive lowercased
            self._schema = schema
            self._entry = _resolve(
                base, int(as_of) if as_of is not None else None
            )
            snap_dir = os.path.join(base, self._entry["dir"])
            self._files = sorted(
                (rel, p) for (rel, _ino), p in _snapshot_files(snap_dir).items()
            )
            self._mapping = _col_mapping(self._entry)  # logical->physical
            self._tombstones = _read_tombstones(base, self._entry)
            self._ranges: dict[str, list] = {}
            self._part_in: dict[str, set[str]] = {}
            self._not_null: set[str] = set()
            self._only_null: set[str] = set()

        # -- pushdown: collect prunable predicates, support NONE --------
        def pushFilters(self, filters):
            part_cols = {
                c for rel, _ in self._files
                for c in _partition_values(rel)
            }
            for f in filters:
                attr = getattr(f, "attribute", None)
                if not attr or len(attr) != 1:
                    continue
                col = attr[0]
                if isinstance(f, EqualTo):
                    if col in part_cols:
                        self._part_in[col] = {str(f.value)}
                    self._tighten(col, f.value, f.value)
                elif isinstance(f, In):
                    vals = list(f.value)  # In.value is the literal TUPLE
                    if col in part_cols:
                        self._part_in[col] = {str(v) for v in vals}
                    if vals and all(v is not None for v in vals):
                        try:
                            self._tighten(col, min(vals), max(vals))
                        except TypeError:
                            pass  # mixed/unorderable literal types
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._tighten(col, f.value, None)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._tighten(col, None, f.value)
                elif isinstance(f, IsNotNull):
                    self._not_null.add(col)
                elif isinstance(f, IsNull):
                    self._only_null.add(col)
            # return EVERYTHING as unsupported: Spark re-applies all
            # predicates after the scan, so pruning can never lose rows
            # (strict > vs >= only affects skipping tightness, not
            # results)
            return filters

        def _tighten(self, col: str, lo, hi) -> None:
            cur = self._ranges.setdefault(col, [None, None])
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi

        def partitions(self):
            stats = self._entry.get("stats") or {}
            where = None
            if self._ranges:
                # stats are recorded under PHYSICAL names
                where = {
                    self._mapping.get(c, c): (b[0], b[1])
                    for c, b in self._ranges.items()
                }
            kept = []
            for rel, path in self._files:
                if self._part_in:
                    pv = _partition_values(rel)
                    if any(
                        pv.get(c) is not None and pv[c] not in vals
                        for c, vals in self._part_in.items()
                    ):
                        continue  # partition-directory pruning
                if where and rel in stats:
                    try:
                        if not _file_matches(stats[rel], where):
                            continue  # manifest min/max skipping
                    except ValueError:
                        pass  # incomparable stat/filter types: keep
                if (self._not_null or self._only_null) and rel in stats:
                    per_col = stats[rel]
                    skip = False
                    for c in self._not_null:
                        s = per_col.get(self._mapping.get(c, c))
                        if s and s["rows"] and s["nulls"] == s["rows"]:
                            skip = True  # all-null file, col must be set
                            break
                    for c in self._only_null:
                        s = per_col.get(self._mapping.get(c, c))
                        if s and s["nulls"] == 0 and s["rows"]:
                            skip = True  # no nulls, col must be null
                            break
                    if skip:
                        continue
                kept.append(_LakeFilePartition(path, rel))
            return kept

        def read(self, partition):
            import pyarrow.parquet as pq

            table = pq.read_table(partition.path)
            n = table.num_rows
            pv = _partition_values(partition.rel)
            cols = []
            key_idx: dict[str, int] = {}
            for i, field in enumerate(self._schema.fields):
                key_idx[field.name] = i
                if field.name in pv:
                    cols.append([_cast_partition(pv[field.name],
                                                 field.dataType)] * n)
                    continue
                phys = self._mapping.get(field.name, field.name)
                if phys in table.column_names:
                    cols.append(table[phys].to_pylist())
                else:
                    # schema evolution: file predates the column
                    cols.append([None] * n)
            rows = zip(*cols) if cols else iter(())
            live = [
                t for t in self._tombstones
                if t["scope"] is None or partition.rel in t["scope"]
            ]
            if not live:
                yield from rows
                return
            for row in rows:
                dead = False
                for t in live:
                    key = tuple(row[key_idx[c]] for c in t["key_cols"])
                    if key in t["keys"]:
                        dead = True
                        break
                if not dead:
                    yield row

    class VersionedLakeDataSource(DataSource):
        """``spark.read.format("versioned")`` — versioned-lake snapshots
        with manifest/partition file skipping driven by pushFilters."""

        @classmethod
        def name(cls) -> str:
            return "versioned"

        def schema(self):
            import json

            import pyarrow.parquet as pq

            base = self.options.get("path")
            if not base:
                raise ValueError(
                    "versioned source: pass the table base via .load(dir)"
                )
            as_of = self.options.get("asof")
            entry = _resolve(
                base, int(as_of) if as_of is not None else None
            )
            if entry.get("schema_json"):
                return StructType.fromJson(json.loads(entry["schema_json"]))
            # no evolved schema logged: arrow schema of one file
            # (physical names -> logical) + partition columns from the
            # directory layout (int64 when every value is digits).
            # Built as DataType objects directly — schema() runs in a
            # planning process with NO SparkContext, so DDL parsing is
            # unavailable.
            snap = os.path.join(base, entry["dir"])
            files = sorted(_snapshot_files(snap).items())
            if not files:
                raise ValueError(
                    f"versioned source: empty snapshot at {base}"
                )
            (rel0, _ino), path0 = files[0]
            rev = {p: l for l, p in _col_mapping(entry).items()}
            out = StructType()
            for f in pq.read_schema(path0):
                out.add(rev.get(f.name, f.name), _arrow_to_spark(f.type),
                        True)
            part_cols: dict[str, bool] = {}
            for (rel, _i), _p in files:
                for c, v in _partition_values(rel).items():
                    digits = v.lstrip("-").isdigit()
                    part_cols[c] = part_cols.get(c, True) and digits
            for c, all_digits in part_cols.items():
                out.add(c, LongType() if all_digits else StringType(), True)
            return out

        def reader(self, schema):
            return VersionedLakeReader(self.options, schema)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False


def register_versioned_source(spark: SparkSession) -> None:
    """Register the ``versioned`` format on this session (and enable
    Python-source filter pushdown, off by default in Spark 4.1 — the
    reader REQUIRES it: pushFilters is the pruning seam)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover - pyspark < 4
        raise RuntimeError(
            "versioned data source requires the pyspark-4 "
            "Python Data Source API"
        )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedLakeDataSource)
