from big_data_lab_three_spark.ml.cv import (  # noqa: F401
    cross_validate,
    fold_assignments,
)
from big_data_lab_three_spark.ml.pipeline import build_preprocessing  # noqa: F401
from big_data_lab_three_spark.ml.balance import (  # noqa: F401
    class_weights,
    oversample_minority,
    smote,
)
from big_data_lab_three_spark.ml.models import (  # noqa: F401
    MultiModel,
    train_classifier,
)
