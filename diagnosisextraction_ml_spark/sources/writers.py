"""Sinks (SURVEY.md §2.1 S3/S4/S6).

The reference writes single CSV files from driver memory
(`df.to_csv(path, sep='|')`, NB cells 17/80/82;
`writePredictionsToFile`, src/TextClassification.py:431-444). At scale
the default is a partitioned directory write; `single_file=True` is the
small-output compat mode (coalesce(1) — only for driver-sized results
like prediction files and curves, never for the corpus itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_pipe_csv(
    df: DataFrame, path: str, sep: str = "|", single_file: bool = False, mode: str = "overwrite"
) -> None:
    """S3 — `|`-separated CSV sink (ref NB cells 17, 80, 82)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).csv(path, sep=sep, header=True)


def write_predictions(
    df: DataFrame,
    path: str,
    pred_col: str = "PRED",
    label_col: str = "TRUE",
    single_file: bool = True,
) -> None:
    """S3 — prediction sink, `PRED|TRUE` layout.

    Ref: writePredictionsToFile (src/TextClassification.py:431-444;
    src/NLP_functions.py:214-227).
    """
    out = df.select(F.col(pred_col).alias("PRED"), F.col(label_col).alias("TRUE"))
    write_pipe_csv(out, path, sep="|", single_file=single_file)


def export_tree_debug(model, path: str) -> None:
    """S6 — export a fitted decision-tree structure as text.

    Ref: exportTreeGraphViz (src/NLP_functions.py:637-661) — the
    reference writes graphviz; Spark's native equivalent is the
    model's ``toDebugString``.
    """
    with open(path, "w") as fh:
        fh.write(model.toDebugString)
