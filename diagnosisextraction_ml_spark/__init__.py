"""diagnosisextraction_ml_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
levrex/DiagnosisExtraction_ML (a pandas+sklearn EHR text-classification
pipeline), extended with the operators a large-scale LLM training-data
pipeline needs (dedup, similarity search, multimodal columns, text
analysis), all designed for 100 TB scale:

- declarative DataFrame plans (Catalyst optimizes; no driver-side loops
  over row-level data),
- built-in `pyspark.sql.functions` for every hot path (whole-stage
  codegen), Arrow-batched pandas UDFs only where Spark lacks a builtin
  (stemming, edit distance),
- aggregation-shaped algorithms (group-concat, window cumsums, token
  dedup before expensive per-token work) instead of the reference's
  per-row Python loops.

Package layout (SURVEY.md §7):
- ``sources``    — CSV/Parquet readers & writers with explicit schemas.
- ``functions``  — scalar/text functions, stemmer, typo correction,
                   shared hashing, statistics.
- ``operators``  — prep (merge/binarize/sample/split), eval (curve
                   engine, confusion, thresholds), dedup, similarity,
                   text analysis, multimodal.
- ``plans``      — feature pipeline, model zoo, CV harness (the
                   TextClassification-equivalent orchestrator).
- ``streaming``  — Structured Streaming variants of the event operators.
"""

__version__ = "0.1.0"

from diagnosisextraction_ml_spark.session import get_spark  # noqa: F401
