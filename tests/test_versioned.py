"""Versioned copy-on-write tables: commit, time travel, update, delete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.sources.versioned import (
    delete_where,
    read_version,
    table_versions,
    update_where,
    write_version,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def test_versioned_write_read_time_travel(spark, root):
    df0 = spark.range(5).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )
    assert write_version(df0, root) == 0
    v1 = update_where(
        spark, root, F.col("id") >= 3, {"val": F.col("val") + 1}
    )
    assert v1 == 1
    v2 = delete_where(spark, root, F.col("id") == 0)
    assert v2 == 2
    assert table_versions(root) == [0, 1, 2]

    latest = {
        r.id: r.val for r in read_version(spark, root).collect()
    }
    assert latest == {1: 10, 2: 20, 3: 31, 4: 41}
    # time travel: v0 unchanged by later mutations
    v0 = {r.id: r.val for r in read_version(spark, root, 0).collect()}
    assert v0 == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40}
    v1r = {r.id: r.val for r in read_version(spark, root, 1).collect()}
    assert v1r == {0: 0, 1: 10, 2: 20, 3: 31, 4: 41}


def test_delete_where_retains_null_predicate_rows(spark, root):
    """SQL DELETE WHERE keeps rows where the predicate is NULL; a bare
    filter(~cond) would silently delete them (ADVICE r2)."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 3)], "id long, x int"
    )
    write_version(df, root)
    delete_where(spark, root, F.col("x") > 5)
    out = {r.id for r in read_version(spark, root).collect()}
    assert out == {2, 3}  # id=2 (x NULL) survives, id=1 (x=10) deleted


def test_versioned_errors(spark, root):
    with pytest.raises(FileNotFoundError):
        read_version(spark, root)
    write_version(spark.range(3), root)
    with pytest.raises(ValueError):
        read_version(spark, root, 7)


def test_versioned_sidecar_update_s10_shape(spark, root):
    """The reference's S10 mutation (IntendedFor rewrite in sidecar
    JSON) as a versioned update: json field rewritten for matching
    rows, old version still readable."""
    side = spark.createDataFrame(
        [
            (1, '{"IntendedFor": "run-1"}'),
            (2, '{"IntendedFor": "run-1"}'),
            (3, '{"IntendedFor": "run-2"}'),
        ],
        "file_id long, sidecar string",
    )
    write_version(side, root)
    update_where(
        spark,
        root,
        F.get_json_object("sidecar", "$.IntendedFor") == "run-1",
        {
            "sidecar": F.to_json(
                F.struct(F.lit("run-1b").alias("IntendedFor"))
            )
        },
    )
    out = {
        r.file_id: r.sidecar
        for r in read_version(spark, root).collect()
    }
    assert out[1] == '{"IntendedFor":"run-1b"}'
    assert out[3] == '{"IntendedFor": "run-2"}'
    old = {
        r.file_id: r.sidecar
        for r in read_version(spark, root, 0).collect()
    }
    assert old[1] == '{"IntendedFor": "run-1"}'


def test_merge_into_upsert(spark, tmp_path):
    """MERGE semantics: matched keys replaced wholesale by the source
    row, unmatched current rows survive untouched, source-only keys
    insert, and the merge lands as a new version (time travel still
    sees the pre-merge state)."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.sources.versioned import (
        merge_into,
        read_version,
        write_version,
    )

    root = str(tmp_path / "vt")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, tag string, v long",
    )
    write_version(base, root, operation="create")
    source = spark.createDataFrame(
        [(2, "B2", 99), (4, "d", 40)], "id long, tag string, v long"
    )
    ver = merge_into(spark, root, source, on=["id"])
    got = {
        r["id"]: (r["tag"], r["v"])
        for r in read_version(spark, root).collect()
    }
    assert got == {1: ("a", 10), 2: ("B2", 99), 3: ("c", 30), 4: ("d", 40)}
    # pre-merge version intact
    pre = {
        r["id"]: r["tag"]
        for r in read_version(spark, root, version=ver - 1).collect()
    }
    assert pre == {1: "a", 2: "b", 3: "c"}


def test_vacuum_expires_history_keeps_latest(spark, tmp_path):
    import pytest as _pt

    from neuroimaging_data_pipeline_spark.sources.versioned import (
        _read_manifest,
        read_version,
        table_versions,
        vacuum,
        write_version,
    )

    root = str(tmp_path / "vac")
    for n in (1, 2, 3):
        write_version(
            spark.range(n).withColumnRenamed("id", "k"), root
        )
    assert vacuum(root, keep_last=1) == [0, 1]
    # latest read untouched
    assert read_version(spark, root).count() == 3
    # expired reads raise a clean error (not a file-not-found)
    with _pt.raises(ValueError, match="vacuumed"):
        read_version(spark, root, version=0)
    # audit trail survives: manifest still lists all three versions
    assert table_versions(root) == [0, 1, 2]
    doc = _read_manifest(root)
    assert [v.get("expired", False) for v in doc["versions"]] == [
        True,
        True,
        False,
    ]
    # vacuuming again is a no-op
    assert vacuum(root, keep_last=1) == []


def test_compact_binpacks_and_range_clusters(spark, root):
    """OPTIMIZE-style compaction: exact file counts, identical rows,
    disjoint per-file key ranges, auditable as a new version (time
    travel still reaches the shattered layout)."""
    from neuroimaging_data_pipeline_spark.sources.versioned import (
        compact,
        list_data_files,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("val")
    )
    write_version(df.repartition(16), root)  # small-file debris
    assert len(list_data_files(root)) == 16
    info = compact(spark, root, target_files=3, sort_by=["id"])
    assert info == {"version": 1, "files_before": 16, "files_after": 3}
    assert list_data_files(root, 1) == list_data_files(root)
    # identical rows
    latest = read_version(spark, root)
    assert latest.count() == 1000
    assert {r.id for r in latest.collect()} == set(range(1000))
    # range clustering: per-file [min, max] key spans are disjoint
    spans = sorted(
        (r.mn, r.mx)
        for r in latest.withColumn(
            "_f", F.input_file_name()
        ).groupBy("_f").agg(
            F.min("id").alias("mn"), F.max("id").alias("mx")
        ).collect()
    )
    assert len(spans) == 3
    for (_, mx_prev), (mn, _) in zip(spans, spans[1:]):
        assert mn > mx_prev
    # the pre-compaction layout is still reachable via time travel
    assert read_version(spark, root, 0).count() == 1000
    assert table_versions(root) == [0, 1]
    # bad target is loud
    with pytest.raises(ValueError, match="target_files"):
        compact(spark, root, target_files=0)


def test_compact_without_sort_is_pure_binpack(spark, root):
    from neuroimaging_data_pipeline_spark.sources.versioned import (
        compact,
        list_data_files,
    )

    df = spark.range(200).select(F.col("id"))
    write_version(df.repartition(8), root)
    info = compact(spark, root, target_files=2)
    assert info["files_after"] == len(list_data_files(root)) == 2
    assert read_version(spark, root).count() == 200
