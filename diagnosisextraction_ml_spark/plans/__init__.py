from diagnosisextraction_ml_spark.plans.features import build_tfidf_stages  # noqa: F401
from diagnosisextraction_ml_spark.plans.models import MODEL_REGISTRY, build_model_pipeline  # noqa: F401
from diagnosisextraction_ml_spark.plans.harness import CVConfig, TextClassificationHarness  # noqa: F401
