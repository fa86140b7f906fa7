"""S1-S6 — reader/writer round trips."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.sources.readers import (
    load_table,
    read_ehr_entries,
    read_patient_cache,
    read_predictions,
)
from diagnosisextraction_ml_spark.sources.writers import (
    write_pipe_csv,
    write_predictions,
)


def test_read_ehr_entries(spark, reference_dir):
    df = read_ehr_entries(spark, f"{reference_dir}/sample_data/dummydata.csv")
    assert df.columns == ["PATNR", "annotation", "text"]
    assert dict(df.dtypes)["annotation"] == "boolean"
    assert df.count() == 2000
    assert df.filter(F.col("text").isNull()).count() == 0  # S5 fill


def test_read_patient_cache(spark, reference_dir):
    df = read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv")
    assert df.count() == 668
    assert dict(df.dtypes)["PATNR"] == "double"


def test_predictions_round_trip(spark, reference_dir, tmp_path):
    df = read_predictions(spark, f"{reference_dir}/output_files/predSVM.csv")
    n = df.count()
    out = str(tmp_path / "preds")
    write_predictions(df, out)
    files = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(files) == 1  # single_file mode
    back = read_predictions(spark, out)
    assert back.count() == n
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_pipe_csv_round_trip(spark, tmp_path):
    df = spark.createDataFrame([("a b", 1.0, "y"), ("c", 2.0, "n")], "Text string, PATNR double, Outcome string")
    out = str(tmp_path / "cache")
    write_pipe_csv(df, out, single_file=True)
    back = read_patient_cache(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_load_tables(spark, sf_dir):
    assert load_table(spark, sf_dir, "region").count() == 5
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_export_tree_debug(spark, tmp_path):
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.linalg import Vectors

    from diagnosisextraction_ml_spark.sources.writers import export_tree_debug

    df = spark.createDataFrame(
        [(Vectors.dense([0.0]), 0), (Vectors.dense([1.0]), 1)] * 5, ["features", "label"]
    )
    model = DecisionTreeClassifier().fit(df)
    path = str(tmp_path / "tree.txt")
    export_tree_debug(model, path)
    assert "DecisionTreeClassificationModel" in open(path).read()


def test_export_tree_graphviz(spark, tmp_path):
    """S6 — reference-format .dot export (exportTreeGraphViz,
    /root/reference/src/NLP_functions.py:637-661): a parseable graphviz
    digraph with one box node per tree node, split conditions using the
    provided feature names, True/False head-labels at the root, and
    POSITIVE/NEGATIVE class names."""
    import re

    from pyspark.ml.classification import DecisionTreeClassifier, RandomForestClassifier
    from pyspark.ml.linalg import Vectors

    from diagnosisextraction_ml_spark.sources.writers import export_tree_graphviz

    rows = [
        (Vectors.dense([0.0, 1.0]), 0),
        (Vectors.dense([0.1, 0.8]), 0),
        (Vectors.dense([1.0, 0.1]), 1),
        (Vectors.dense([0.9, 0.0]), 1),
    ] * 5
    df = spark.createDataFrame(rows, ["features", "label"])
    model = DecisionTreeClassifier(maxDepth=3).fit(df)
    path = str(tmp_path / "tree.dot")
    dot = export_tree_graphviz(model, path, feature_names=["reuma", "artritis"])
    on_disk = open(path).read()
    assert dot == on_disk
    assert dot.startswith("digraph Tree {") and dot.rstrip().endswith("}")
    node_lines = re.findall(r'^(\d+) \[label=<.*>, fillcolor="#[0-9a-f]{6}"\] ;$',
                            dot, flags=re.M)
    edge_lines = re.findall(r"^(\d+) -> (\d+)", dot, flags=re.M)
    assert len(node_lines) >= 3  # root + 2 children minimum
    assert len(edge_lines) == len(node_lines) - 1  # a tree
    assert 'headlabel="True"' in dot and 'headlabel="False"' in dot
    assert "reuma" in dot or "artritis" in dot  # feature names used
    assert "POSITIVE" in dot and "NEGATIVE" in dot
    # every edge source/target is a declared node id
    ids = {n for n in node_lines}
    assert all(a in ids and b in ids for a, b in edge_lines)

    # ensemble path: tree_index picks a subtree from a RandomForest
    rf = RandomForestClassifier(numTrees=3, maxDepth=2, seed=7).fit(df)
    dot_rf = export_tree_graphviz(rf, str(tmp_path / "rf0.dot"), tree_index=1)
    assert dot_rf.startswith("digraph Tree {")
