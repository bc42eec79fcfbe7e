"""Partition evolution (round 11): ``set_partition_spec`` changes the
partition layout for FUTURE writes with zero data movement (Iceberg
spec-evolution semantics scoped to hive layouts).  Old-era files keep
their own directory layouts; reads union one partition-prunable scan
per era, resolving every column from the era's path or from file
data.  Partition-scoped rewrites refuse while eras are mixed;
``compact_versioned(partition_by=...)`` migrates and re-records the
spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    LogicalConflictError,
    _read_log,
    _test_hooks,
    compact_versioned,
    copy_into,
    delete_where,
    drop_column,
    merge_versioned,
    metadata_aggregate,
    read_version,
    rename_column,
    restore_version,
    set_partition_spec,
    table_changes,
    widen_column_type,
    write_version,
)

from .conftest import rows


@pytest.fixture(autouse=True)
def _clean_hooks():
    yield
    _test_hooks.pop("before_commit", None)


def _land(spark, tmp_path, name, lo, hi):
    d = str(tmp_path / name)
    spark.range(lo, hi).selectExpr(
        "id AS k",
        "CAST(id % 3 AS INT) AS day",
        "CAST(id % 4 AS INT) AS bucket",
        "id * 2 AS v",
    ).repartition(1).write.mode("overwrite").parquet(d)
    return d


def _seed(spark, tmp_path, base, **kw):
    copy_into(
        spark, base, _land(spark, tmp_path, "l1", 0, 24),
        stats_cols=("k", "day", "bucket"), partition_by=("day",), **kw
    )


class TestEvolution:
    def test_mixed_era_read(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        v = set_partition_spec(spark, base, ["bucket"])
        assert _read_log(base)[-1]["op"] == "set_spec"
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 36))
        tip = read_version(spark, base)
        assert tip.count() == 36
        assert tip.agg(F.sum("v")).first()[0] == 36 * 35
        # old-era partition col: path for era A, data for era B
        assert tip.filter(F.col("day") == 1).count() == 12
        # new-era partition col: data for era A, path for era B
        assert tip.filter(F.col("bucket") == 2).count() == 9
        # both eras physically present
        layouts = {
            r.split("/")[0].split("=")[0]
            for r in _read_log(base)[-1]["files"]
        }
        assert layouts == {"day", "bucket"}
        # time travel: the pre-evolution snapshot still reads day-era
        assert read_version(spark, base, as_of=v - 1).count() == 24

    def test_flat_to_partitioned(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 12),
            stats_cols=("k",),
        )
        set_partition_spec(spark, base, ["day"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 12, 24))
        tip = read_version(spark, base)
        assert tip.count() == 24
        assert tip.filter(F.col("day") == 0).count() == 8

    def test_partitioned_to_flat(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, [])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 30))
        tip = read_version(spark, base)
        assert tip.count() == 30
        assert tip.filter(F.col("day") == 0).count() == 10

    def test_where_boxes_stay_exact_across_eras(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        # a SINGLE-day landing batch (k ≡ 1 mod 3) keeps the day box
        # file-aligned in era B too — exactness-by-refusal requires
        # aligned files, evolution doesn't change that contract
        d = str(tmp_path / "l2")
        spark.range(25, 36, 3).selectExpr(
            "id AS k", "CAST(id % 3 AS INT) AS day",
            "CAST(id % 4 AS INT) AS bucket", "id * 2 AS v",
        ).repartition(1).write.parquet(d)
        copy_into(spark, base, d, stats_cols=("k", "day", "bucket"))
        # the day box stays exact across eras: era A resolves day from
        # the path, era B from footer stats (single-valued per file),
        # zero data pages either way
        assert metadata_aggregate(
            base, [], where={"day": (1, 1)}
        )["rows"] == 12
        # the bucket box is honestly REFUSED while eras are mixed:
        # bucket-2 rows hide INSIDE era-A day files (the box cuts
        # them), and pretending exactness would be a wrong answer —
        # compact into the bucket layout to make the box file-aligned
        with pytest.raises(ValueError, match="cuts file"):
            metadata_aggregate(base, [], where={"bucket": (2, 2)})
        compact_versioned(
            spark, base, partition_by=("bucket",),
            stats_cols=("k", "day", "bucket"),
        )
        # bucket=2: six era-A rows (2,6,10,14,18,22) plus k=34
        assert metadata_aggregate(
            base, [], where={"bucket": (2, 2)}
        )["rows"] == 7

    def test_scoped_rewrites_refuse_then_compact_migrates(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 36))
        upd = spark.createDataFrame(
            [(1, 1, 1, 999)], "k long, day int, bucket int, v long"
        )
        with pytest.raises(ValueError, match="layout era"):
            merge_versioned(
                spark, base, upd, ["k"], partition_by=("bucket",),
                keys_are_partition_stable=True,
            )
        # the OLD spec is no longer the effective one either
        with pytest.raises(ValueError, match="does not match|layout"):
            copy_into(
                spark, base, _land(spark, tmp_path, "l3", 36, 40),
                partition_by=("day",),
            )
        compact_versioned(
            spark, base, partition_by=("bucket",),
            stats_cols=("k", "day", "bucket"),
        )
        assert _read_log(base)[-1]["partition_spec"] == ["bucket"]
        merge_versioned(
            spark, base, upd, ["k"], partition_by=("bucket",),
            keys_are_partition_stable=True,
            stats_cols=("k", "day", "bucket"),
        )
        got = read_version(spark, base)
        assert got.filter("k = 1").first()["v"] == 999
        assert got.count() == 36
        # spec carried through the merge; appends keep flowing
        copy_into(spark, base, _land(spark, tmp_path, "l4", 36, 40))
        assert read_version(spark, base).count() == 40

    def test_positional_delete_during_mixed_era(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 36))
        delete_where(spark, base, "v >= 60")  # k >= 30, era B only
        tip = read_version(spark, base)
        assert tip.count() == 30
        delete_where(spark, base, "k < 3")  # era A
        assert read_version(spark, base).count() == 27

    def test_era_columns_locked_against_shape_changes(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        # day left the spec but is still era-A's directory layout
        with pytest.raises(ValueError, match="partition column"):
            rename_column(spark, base, {"day": "d2"})
        with pytest.raises(ValueError, match="partition column"):
            drop_column(spark, base, "day")
        with pytest.raises(ValueError, match="partition column"):
            widen_column_type(spark, base, {"day": "bigint"})
        # the new spec column locks too
        with pytest.raises(ValueError, match="partition column"):
            drop_column(spark, base, "bucket")

    def test_refusals(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        with pytest.raises(ValueError, match="not in columns"):
            set_partition_spec(spark, base, ["nope"])
        with pytest.raises(ValueError, match="already the effective"):
            set_partition_spec(spark, base, ["day"])
        with pytest.raises(ValueError, match="duplicate"):
            set_partition_spec(spark, base, ["bucket", "bucket"])
        rename_column(spark, base, {"v": "val"})
        with pytest.raises(ValueError, match="column-mapped"):
            set_partition_spec(spark, base, ["val"])

    def test_cdf_neutral_and_restore(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        v = set_partition_spec(spark, base, ["bucket"])
        assert table_changes(
            spark, base, ["k"], from_version=v - 1, to_version=v
        ).count() == 0
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 30))
        # restore to the pre-evolution snapshot: day-era files only,
        # effective spec back to the path-derived day layout
        restore_version(base, v - 1)
        assert read_version(spark, base).count() == 24
        copy_into(
            spark, base, _land(spark, tmp_path, "l3", 40, 44),
            partition_by=("day",),
        )
        assert read_version(spark, base).count() == 28

    def test_concurrent_merge_conflicts_on_spec_change(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)

        def hook():
            _test_hooks.pop("before_commit", None)
            set_partition_spec(spark, base, ["bucket"])

        _test_hooks["before_commit"] = hook
        # the spec change drifts table semantics (set_spec also pins
        # the schema, so either key may be the one named)
        with pytest.raises(
            LogicalConflictError, match="schema_json|partition_spec"
        ):
            merge_versioned(
                spark, base,
                spark.createDataFrame(
                    [(1, 1, 1, 999)], "k long, day int, bucket int, v long"
                ),
                ["k"], partition_by=("day",),
                keys_are_partition_stable=True,
            )

    def test_concurrent_append_conflicts_on_spec_change(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        land = _land(spark, tmp_path, "l2", 24, 30)

        def hook():
            _test_hooks.pop("before_commit", None)
            set_partition_spec(spark, base, ["bucket"])

        _test_hooks["before_commit"] = hook
        with pytest.raises(LogicalConflictError):
            copy_into(spark, base, land)
        # the documented re-run stages under the NEW spec
        copy_into(spark, base, land)
        assert read_version(spark, base).count() == 30

    def test_ds_writer_refuses_specced_flat_table(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )

        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 6),
            stats_cols=("k",),
        )
        set_partition_spec(spark, base, ["day"])
        register_versioned_source(spark)
        df = spark.createDataFrame(
            [(99, 0, 0, 0)], "k long, day int, bucket int, v long"
        )
        with pytest.raises(Exception, match="hive-partitioned"):
            df.write.format("versioned").mode("append").save(base)

    def test_ds_reader_mixed_era(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )

        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 36))
        register_versioned_source(spark)
        out = spark.read.format("versioned").load(base)
        assert out.count() == 36
        assert out.filter(F.col("day") == 1).count() == 12
        assert out.filter(F.col("bucket") == 2).count() == 9
        assert out.agg(F.sum("v")).first()[0] == 36 * 35

    def test_flat_rewrites_refuse_on_specced_table(self, spark, tmp_path):
        """An unpartitioned full rewrite (merge/purge/compact without
        partition_by) on a spec'd table would silently cancel the
        evolution — each refuses by name; clearing the spec first (or
        passing the spec) is the sanctioned path."""
        from etl_opensky_spark.sources.versioned import purge_versioned

        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        upd = spark.createDataFrame(
            [(1, 1, 1, 999)], "k long, day int, bucket int, v long"
        )
        with pytest.raises(ValueError, match="partition spec"):
            merge_versioned(spark, base, upd, ["k"])
        with pytest.raises(ValueError, match="partition spec"):
            purge_versioned(
                spark, base,
                spark.createDataFrame([(1,)], "k long"), ["k"],
            )
        with pytest.raises(ValueError, match="partition spec"):
            compact_versioned(spark, base)
        # clearing the spec re-opens the flat path
        set_partition_spec(spark, base, [])
        compact_versioned(spark, base)
        assert read_version(spark, base).count() == 24

    def test_overwrite_updates_sticky_spec(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        df = spark.range(6).selectExpr(
            "id AS k", "CAST(id % 3 AS INT) AS day",
            "CAST(id % 4 AS INT) AS bucket", "id * 2 AS v",
        )
        write_version(df, base, partition_by=("day",))
        assert _read_log(base)[-1]["partition_spec"] == ["day"]
        # subsequent appends follow the overwrite's layout
        copy_into(spark, base, _land(spark, tmp_path, "l2", 10, 13))
        assert read_version(spark, base).count() == 9

    def test_optimize_small_files_per_era(self, spark, tmp_path):
        """Incremental OPTIMIZE during a mixed era compacts within
        each layout era's directories, and under a pinned read schema
        never bakes null partition columns into the staged files."""
        import glob

        import pyarrow.parquet as pq

        from etl_opensky_spark.sources.versioned import (
            optimize_small_files,
        )

        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        for i in range(3):  # several small new-era appends
            copy_into(
                spark, base,
                _land(spark, tmp_path, f"l{i}", 24 + 4 * i, 28 + 4 * i),
            )
        before = read_version(spark, base).count()
        v, n = optimize_small_files(
            spark, base, target_rows_per_file=1000, small_file_rows=1000
        )
        assert n > 0
        assert read_version(spark, base).count() == before == 36
        entry = _read_log(base)[-1]
        # staged files under hive dirs carry no physical copy of the
        # dir's own partition column
        for rel in entry["files"]:
            parts = [
                p.split("=", 1)[0] for p in rel.split("/")[:-1]
                if "=" in p
            ]
            if not parts:
                continue
            path = f"{base}/{entry['dir']}/{rel}"
            footer_cols = set(pq.read_schema(path).names)
            assert not (footer_cols & set(parts)), (rel, footer_cols)

    def test_change_feed_across_evolution(self, spark, tmp_path):
        """CDF and the materialized change feed keep flowing through a
        partition evolution: the spec commit is change-free, and
        appends on either side of it surface as inserts."""
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
        )

        base = str(tmp_path / "lake")
        feed = str(tmp_path / "feed")
        _seed(spark, tmp_path, base)
        set_partition_spec(spark, base, ["bucket"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 30))
        n_vers, n_rows = materialize_change_feed(
            spark, base, feed, ["k"]
        )
        # versions 2 (set_spec, zero changes) and 3 (6 inserts)
        assert n_vers == 2
        assert n_rows == 6
        ch = table_changes(spark, base, ["k"], from_version=1)
        assert sorted(r["k"] for r in ch.collect()) == list(range(24, 30))
        assert set(r["_change_type"] for r in ch.collect()) == {"insert"}

    def test_float_spec_refused(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.range(4).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS score",
            "CAST(id % 2 AS INT) AS p",
        )
        write_version(df, base)
        with pytest.raises(ValueError, match="float/double/binary"):
            set_partition_spec(spark, base, ["score"])
        set_partition_spec(spark, base, ["p"])  # int is fine


class TestEvolutionProperty:
    @pytest.mark.parametrize("seed", [7, 23])
    def test_randomized_lifecycle_matches_model(
        self, spark, tmp_path, seed
    ):
        """Model-based randomized lifecycle: a random interleaving of
        partition-shaped appends, spec changes (day → bucket → flat →
        ...), compact migrations, positional deletes, and merges
        (attempted whenever the caller would — refusals must ONLY
        happen in the documented mixed-era/flat-spec states) always
        matches a plain Python dict model of the table, and every
        read resolves both partition columns correctly whichever era
        encodes them."""
        import random

        from etl_opensky_spark.sources.versioned import purge_versioned

        rnd = random.Random(seed)
        base = str(tmp_path / "lake")
        model: dict[int, tuple[int, int, int]] = {}  # k -> (day, bucket, v)
        specs = [["day"], ["bucket"], []]
        cur_spec = ["day"]
        next_k = 0
        land_i = 0

        def land(rows):
            nonlocal land_i
            land_i += 1
            d = str(tmp_path / f"land{land_i}")
            spark.createDataFrame(
                [(k, k % 3, k % 4, v) for k, v in rows],
                "k long, day int, bucket int, v long",
            ).repartition(1).write.mode("overwrite").parquet(d)
            return d

        # seed (appends are BLIND file ingests — keys must be fresh,
        # or the table legitimately holds duplicate rows per key and
        # the keyed model stops being a model)
        rows = [(k, k * 2) for k in range(8)]
        next_k = 8
        copy_into(
            spark, base, land(rows), stats_cols=("k",),
            partition_by=tuple(cur_spec),
        )
        model.update({k: (k % 3, k % 4, v) for k, v in rows})
        mixed = False
        for _ in range(14):
            op = rnd.choice(
                ["append", "append", "set_spec", "compact", "delete",
                 "merge"]
            )
            if op == "append":
                rows = [(next_k + i, (next_k + i) * 2) for i in range(4)]
                next_k += 4
                copy_into(spark, base, land(rows))
                model.update(
                    {k: (k % 3, k % 4, v) for k, v in rows}
                )
                # an append under a changed spec leaves eras mixed
                mixed = mixed or False
            elif op == "set_spec":
                new = rnd.choice([s for s in specs if s != cur_spec])
                set_partition_spec(spark, base, new)
                cur_spec = new
                mixed = True  # until a compact migrates
            elif op == "compact":
                if cur_spec:
                    compact_versioned(
                        spark, base, partition_by=tuple(cur_spec),
                        stats_cols=("k",),
                    )
                else:
                    try:
                        compact_versioned(spark, base, stats_cols=("k",))
                    except ValueError:
                        # spec'd-table flat-compact refusal (only when
                        # a non-empty spec is recorded)
                        assert cur_spec
                        continue
                mixed = False
            elif op == "delete":
                if not model:
                    continue
                cut = rnd.choice(sorted(model))
                delete_where(spark, base, f"k = {cut}")
                model.pop(cut, None)
            elif op == "merge":
                if not model:
                    continue
                tgt = rnd.choice(sorted(model))
                day, bucket, _v = model[tgt]
                upd = spark.createDataFrame(
                    [(tgt, day, bucket, 9_000 + tgt)],
                    "k long, day int, bucket int, v long",
                )
                try:
                    merge_versioned(
                        spark, base, upd, ["k"],
                        partition_by=tuple(cur_spec) or (),
                        keys_are_partition_stable=True,
                        stats_cols=("k",),
                    )
                except ValueError:
                    # legal ONLY in the documented states: mixed eras
                    # for a partitioned merge, or a flat merge over a
                    # non-empty recorded spec
                    assert mixed or not cur_spec
                    continue
                model[tgt] = (day, bucket, 9_000 + tgt)
            got = {
                r["k"]: (r["day"], r["bucket"], r["v"])
                for r in read_version(spark, base).collect()
            }
            assert got == model


def test_describe_table(spark, tmp_path):
    """describe_table: one metadata-only dict covering files/rows,
    effective spec + layout eras, riders, and MOR state."""
    from etl_opensky_spark.sources.versioned import (
        add_constraint,
        delete_where,
        describe_table,
    )

    base = str(tmp_path / "lake")
    d = str(tmp_path / "land")
    spark.range(12).selectExpr(
        "id AS k",
        "timestamp(date_add(date'2020-01-01', CAST(id / 4 AS INT))) "
        "AS ts",
        "id * 2 AS v",
    ).repartition(1).write.parquet(d)
    copy_into(
        spark, base, d, stats_cols=("k",), partition_by=("p_day",),
        generated={"p_day": "to_date(ts)"},
    )
    add_constraint(spark, base, "v_pos", "v >= 0")
    t = describe_table(base)
    assert t["n_files"] == 3 and t["n_rows"] == 12
    assert t["partition_spec"] == ["p_day"]
    assert t["layout_eras"] == [["p_day"]]
    assert t["mixed_layouts"] is False
    assert t["generated_cols"] == {"p_day": "to_date(ts)"}
    assert "v_pos" in t["constraints"]
    assert t["stats_cols"] == ["k"]
    set_partition_spec(spark, base, [])
    delete_where(spark, base, "k = 3")
    t2 = describe_table(base)
    assert t2["partition_spec"] == []
    assert t2["mixed_layouts"] is True  # p_day-era files still live
    assert t2["n_tombstones"] == 1
    assert t2["has_positional_deletes"] is True
    # time travel: the pre-evolution snapshot describes the old state
    t0 = describe_table(base, as_of=t["version"])
    assert t0["partition_spec"] == ["p_day"]
    assert t0["n_tombstones"] == 0
