from osmcha_spark.functions.words import (  # noqa: F401
    make_pattern,
    find_words_col,
    find_words_py,
    suspect_comment_col,
    illegal_source_col,
    illegal_imagery_col,
)
from osmcha_spark.functions.rules import (  # noqa: F401
    powerful_editor_col,
    warning_reasons_col,
    count_rule_reason_col,
    user_reasons_col,
)
