"""Source/sink format round-trips + partition pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cloud_data_sync_spark.sources.formats import read_table, write_table
from cloud_data_sync_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml"])
def test_round_trip(spark, tmp_path, fmt):
    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / fmt)
    write_table(nation, path, fmt)
    back = read_table(spark, path, fmt, schema=SCHEMA)
    assert back.schema == nation.select(*back.columns).schema
    orig = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in back.select(*nation.columns).collect()} == orig


def test_schema_required_for_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_by_status")
    write_table(orders, path, "parquet", partition_by=["status"])
    # layout: one directory per status value
    dirs = {d for d in os.listdir(path) if d.startswith("status=")}
    assert len(dirs) >= 2
    back = read_table(spark, path, "parquet").filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the equality filter must become directory pruning, not a data filter
    assert "PartitionFilters: [" in plan and "status" in plan.split("PartitionFilters:")[1][:120]
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_partitioned_write_one_file_per_partition(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_compact")
    write_table(orders, path, "parquet", partition_by=["status"])
    for d in os.listdir(path):
        if d.startswith("status="):
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1, f"{d}: repartition should yield one file, got {files}"


def test_compact_table_merges_small_files(spark, tmp_path):
    from cloud_data_sync_spark.sources.formats import compact_table

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(20).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 20
    # huge target → everything folds into one file, no shuffle (coalesce)
    n = compact_table(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/part-*")) == 1
    # data survives byte-identically
    a = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert a == list(range(10000))


def test_compact_table_respects_target_size(spark, tmp_path):
    from cloud_data_sync_spark.sources.formats import compact_table

    src = str(tmp_path / "small2")
    dst = str(tmp_path / "compacted2")
    spark.range(50000).selectExpr("id", "repeat('x', 64) AS pad").repartition(
        16
    ).write.parquet(src)
    import glob, os

    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/part-*"))
    # target of ~1/3 the source → ceil(total/target) files out
    target = total // 3
    n = compact_table(spark, src, dst, target_file_bytes=target)
    assert n == -(-total // target)


@pytest.mark.parametrize("fmt", ["csv", "xml"])
def test_compact_schema_formats(spark, tmp_path, fmt):
    """compact_table must work for every member of FORMATS — csv/json/xml
    need the schema passed through (read_table requires it for those)."""
    from cloud_data_sync_spark.sources.formats import compact_table

    nation = load_table(spark, SF_DIR, "nation")
    src = str(tmp_path / f"{fmt}_src")
    write_table(nation, src, fmt)
    n = compact_table(
        spark, src, str(tmp_path / f"{fmt}_out"), fmt=fmt, schema=SCHEMA
    )
    assert n >= 1
    back = read_table(spark, str(tmp_path / f"{fmt}_out"), fmt, schema=SCHEMA)
    assert back.count() == nation.count()


def test_parse_bytes_unknown_suffix_falls_back(spark):
    from cloud_data_sync_spark.tables import _parse_bytes

    assert _parse_bytes("128m", 1) == 128 << 20
    assert _parse_bytes("1pb", 7) == 1 << 50
    assert _parse_bytes("12xyz", 42) == 42  # unknown unit -> default
    assert _parse_bytes("", 42) == 42


def test_plan_cache_misses_after_rewrite(spark, tmp_path):
    """Rewriting a table in-session must invalidate the plan cache (the
    cache key carries the file's size+mtime vintage)."""
    import shutil

    from cloud_data_sync_spark.tables import load_table as lt

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(f"{SF_DIR}/nation.parquet", sf / "nation.parquet")
    first = lt(spark, str(sf), "nation").count()
    # rewrite with fewer rows
    lt(spark, SF_DIR, "nation").limit(3).toPandas().to_parquet(
        sf / "nation.parquet", index=False
    )
    assert lt(spark, str(sf), "nation").count() == 3 != first


def test_compact_preserves_partition_layout(spark, tmp_path):
    """Compacting a partitionBy-written table must re-apply the partition
    layout — a flat rewrite would silently replace directory pruning with
    full scans after the caller's swap (review finding, reproduced)."""
    import os

    from cloud_data_sync_spark.sources.formats import compact_table, write_table

    df = spark.range(100).selectExpr("id", "id % 4 AS part")
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_table(df, src, partition_by=["part"])
    n = compact_table(spark, src, dst)
    assert n >= 4  # at least one data file per partition directory
    parts = sorted(
        d for d in os.listdir(dst) if d.startswith("part=")
    )
    assert parts == ["part=0", "part=1", "part=2", "part=3"]
    got = spark.read.parquet(dst)
    assert got.count() == 100
    assert set(got.columns) == {"id", "part"}
    # partition pruning still works: a filter lists one directory
    assert got.filter("part = 2").count() == 25


def test_compact_splits_oversized_partitions(spark, tmp_path):
    """A partition value whose directory exceeds target_file_bytes must
    compact into MULTIPLE files (within-partition salt), not collapse to
    one oversized file per key=value directory (r4 advice finding)."""
    import glob
    import os

    from cloud_data_sync_spark.sources.formats import compact_table, write_table

    # part=0 is ~50x larger than part=1
    df = spark.range(10200).selectExpr(
        "id",
        "CASE WHEN id < 10000 THEN 0 ELSE 1 END AS part",
        "repeat('x', 64) AS pad",
    )
    src = str(tmp_path / "skew_src")
    dst = str(tmp_path / "skew_dst")
    write_table(df, src, partition_by=["part"])
    big_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{src}/part=0/part-*")
    )
    # target ~1/3 of the big partition → it must split into >= 3 files
    target = max(1, big_bytes // 3)
    compact_table(spark, src, dst, target_file_bytes=target)
    big_out = glob.glob(f"{dst}/part=0/part-*")
    small_out = glob.glob(f"{dst}/part=1/part-*")
    assert len(big_out) >= 3, big_out
    # the small partition still folds to a single file
    assert len(small_out) == 1, small_out
    got = spark.read.parquet(dst)
    assert got.count() == 10200
    assert got.filter("part = 1").count() == 200
