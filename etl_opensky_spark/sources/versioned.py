"""Versioned parquet tables: snapshot-isolation reads and time travel.

The reference overwrites warehouse tables in place
(src/jobs/load_dim_airports.py full refresh) — a reader racing the
writer sees a half-written table, and yesterday's state is gone.
Table formats solve this with immutable snapshots + a manifest pointer;
this module implements that protocol on plain parquet, no library
dependency:

- every write lands in a NEW immutable directory ``v=N`` (never
  modified after commit);
- a single JSON manifest names the committed versions and the current
  one; it is replaced atomically (write-temp + ``os.replace``) AFTER
  the data is fully written — readers can never observe a version that
  is not completely on disk;
- readers resolve the manifest once, then read only their snapshot's
  directory: concurrent writers cannot disturb a running query
  (snapshot isolation), and ``as_of`` re-reads any retained version
  (time travel).

Scale notes: the manifest is O(versions) bytes — metadata, not data;
reads are ordinary partition-prunable parquet scans of one directory.
On an object store the ``os.replace`` commit becomes a conditional PUT
(if-match on the manifest etag) — the same single-pointer protocol
Delta/Iceberg use for their log tip; everything else is unchanged.
Old versions are retired by deleting their directory and dropping them
from the manifest (VACUUM) — not implemented here because retention
policy is deployment-specific.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _manifest_path(base: str) -> str:
    return os.path.join(base, MANIFEST)


def _read_manifest(base: str) -> dict:
    try:
        with open(_manifest_path(base)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"current": 0, "versions": []}


def write_version(df: DataFrame, base: str) -> int:
    """Commit ``df`` as the next version of the table at ``base``.
    Data is fully written to ``v=N`` BEFORE the manifest flips — a
    crash in between leaves an orphan directory (invisible to readers),
    never a torn table.  Returns the committed version number."""
    os.makedirs(base, exist_ok=True)
    man = _read_manifest(base)
    version = man["current"] + 1
    data_dir = os.path.join(base, f"v={version}")
    df.write.mode("errorifexists").parquet(data_dir)

    man = {"current": version, "versions": man["versions"] + [version]}
    tmp = _manifest_path(base) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _manifest_path(base))  # the atomic commit point
    return version


def read_version(
    spark: SparkSession, base: str, as_of: int | None = None
) -> DataFrame:
    """Snapshot read: the current version, or time-travel to ``as_of``.
    Resolves the manifest once — the returned DataFrame is pinned to
    one immutable directory regardless of later commits."""
    man = _read_manifest(base)
    version = man["current"] if as_of is None else as_of
    if version not in man["versions"]:
        raise ValueError(
            f"version {version} not committed at {base}; "
            f"available: {man['versions']}"
        )
    return spark.read.parquet(os.path.join(base, f"v={version}"))


def table_history(base: str) -> list[int]:
    """Committed versions, oldest first."""
    return list(_read_manifest(base)["versions"])
