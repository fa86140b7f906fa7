from diagnosisextraction_ml_spark.sources.readers import (  # noqa: F401
    EHR_ENTRY_SCHEMA,
    EHR_PATIENT_SCHEMA,
    PREDICTIONS_SCHEMA,
    load_table,
    load_tables,
    read_ehr_entries,
    read_patient_cache,
    read_predictions,
)
from diagnosisextraction_ml_spark.sources.writers import (  # noqa: F401
    write_pipe_csv,
    write_predictions,
)
