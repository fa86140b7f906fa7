from diagnosisextraction_ml_spark.operators import (  # noqa: F401
    dedup,
    evaluate,
    joins,
    multimodal,
    prep,
    similarity,
    textstats,
)
