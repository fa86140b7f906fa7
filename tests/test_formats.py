"""JSONL / ORC round-trips and partition pruning on the hive layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.sources import formats
from diagnosisextraction_ml_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_jsonl_roundtrip(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jsonl") / "docs")
    formats.write_jsonl(docs, path)
    back = formats.read_jsonl(spark, path, docs.schema)
    assert back.schema == docs.schema
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_jsonl_failfast_on_corrupt(spark, tmp_path_factory):
    import os

    d = str(tmp_path_factory.mktemp("jsonl_bad"))
    with open(os.path.join(d, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("this is not json\n")
    schema = "doc_id long, text string"
    with pytest.raises(Exception):  # SparkException wrapping FAILFAST
        spark.read.schema(schema).option("mode", "FAILFAST").json(d).collect()


def test_orc_roundtrip(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "docs")
    formats.write_orc(docs, path)
    back = formats.read_orc(spark, path)
    assert back.schema == docs.schema
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_partitioned_parquet_prunes(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "docs_by_lang")
    formats.write_partitioned_parquet(docs, path, ["lang"])
    back = formats.read_partitioned(spark, path)

    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    one = sorted(langs)[0]
    filtered = back.filter(F.col("lang") == one)

    # values survive the hive layout (partition col comes back typed
    # as written because it's a string here)
    expect = _sorted_rows(
        docs.filter(F.col("lang") == one).select(*sorted(docs.columns))
    )
    got = _sorted_rows(filtered.select(*sorted(docs.columns)))
    assert got == expect

    # and the scan prunes: the partition filter reaches the file index
    # (PartitionFilters on the scan node, not a post-scan Filter), and
    # the files actually opened are only the matching lang= directory
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [" in plan
    assert f"lang#" in plan  # partition col resolved as partition attribute
    read_files = {
        r.f
        for r in filtered.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert read_files
    assert all(f"lang={one}" in f for f in read_files)
