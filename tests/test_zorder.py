"""Z-order clustering — morton arithmetic + measured two-dimensional
file locality (the property parquet stats pruning consumes)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.sources import zorder


def test_morton_hand_case(spark):
    # a=5 (101b) at even positions, b=3 (011b) at odd:
    # 1 + 2 + 8 + 16 = 27
    got = spark.range(1).select(
        zorder.morton_code(F.lit(5), F.lit(3), bits=4).alias("z")
    ).collect()[0].z
    assert got == 27


def test_morton_is_bijective_on_grid(spark):
    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    codes = grid.select(
        zorder.morton_code(F.col("a"), F.col("b"), bits=5).alias("z")
    )
    assert codes.distinct().count() == n * n
    mx = codes.agg(F.max("z").alias("m")).collect()[0].m
    assert mx == (1 << 10) - 1


@pytest.fixture(scope="module")
def grid_df(spark):
    # 64x64 uniform grid, hash-shuffled row order (layout must not
    # depend on incoming order)
    n = 64
    return spark.range(n * n).select(
        (F.col("id") % n).alias("a"),
        (F.col("id") / n).cast("long").alias("b"),
        F.col("id").alias("row_id"),
    ).orderBy(F.md5(F.col("id").cast("string")))


def _files_with_matches(spark, path, pred):
    df = spark.read.parquet(path).filter(pred)
    return {
        r.f
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    }


def test_zorder_localizes_both_dimensions(spark, grid_df, tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("zo") / "zordered")
    lpath = str(tmp_path_factory.mktemp("zo") / "linear")
    n_files = 16
    zorder.write_zordered(
        grid_df, zpath, F.col("a"), F.col("b"), n_files=n_files, bits=6
    )
    (
        grid_df.repartitionByRange(n_files, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    total_z = len(_files_with_matches(spark, zpath, F.lit(True)))
    total_l = len(_files_with_matches(spark, lpath, F.lit(True)))
    assert total_z == n_files and total_l == n_files

    # narrow filter on a: both layouts localize
    za = _files_with_matches(spark, zpath, F.col("a") < 8)
    la = _files_with_matches(spark, lpath, F.col("a") < 8)
    assert len(za) <= n_files // 2
    assert len(la) <= n_files // 2

    # narrow filter on b: the linear layout degenerates (every file
    # holds every b); the z-layout still localizes
    zb = _files_with_matches(spark, zpath, F.col("b") < 8)
    lb = _files_with_matches(spark, lpath, F.col("b") < 8)
    assert len(lb) == n_files
    assert len(zb) <= n_files // 2


def test_zordered_write_round_trips(spark, grid_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zo") / "rt")
    zorder.write_zordered(
        grid_df, path, F.col("a"), F.col("b"), n_files=4, bits=6
    )
    back = spark.read.parquet(path)
    assert sorted(back.columns) == ["a", "b", "row_id"]
    assert back.count() == grid_df.count()
    assert sorted(r.row_id for r in back.select("row_id").collect()) == list(
        range(64 * 64)
    )
