from osmcha_spark.plans.analyse import (  # noqa: F401
    action_counts,
    analyse,
    normalize_changesets,
)
