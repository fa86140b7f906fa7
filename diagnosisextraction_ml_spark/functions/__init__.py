from diagnosisextraction_ml_spark.functions.text import (  # noqa: F401
    ARTEFACT_MAP,
    STICKY_CHARS_RE,
    fix_xml_artefacts,
    fold_accents,
    remove_stopwords_expr,
    simple_cleaning,
    tokenize_expr,
    word_match_expr,
)
from diagnosisextraction_ml_spark.functions.hashing import (  # noqa: F401
    md5_hash64,
    md5_hash64_sql,
    knuth_bucket,
    knuth_bucket_sql,
)
from diagnosisextraction_ml_spark.functions.stopwords import DUTCH_STOPWORDS, ENGLISH_STOPWORDS  # noqa: F401
from diagnosisextraction_ml_spark.functions.stemmer import stem_dutch, stem_text_udf  # noqa: F401
from diagnosisextraction_ml_spark.functions.typo import (  # noqa: F401
    damerau_levenshtein,
    normalized_damerau_levenshtein,
    correct_typos,
)
from diagnosisextraction_ml_spark.functions.stats import ttest_5x2cv, t_sf  # noqa: F401
from diagnosisextraction_ml_spark.functions.figures import (  # noqa: F401
    plot_confusion_matrix,
    plot_f1_scores,
    plot_feature_weights,
    plot_lexical_dispersion,
    plot_precision_recall,
    plot_roc_std,
    plot_swarm,
    plot_train_test_distribution,
    plot_word_frequencies,
)
