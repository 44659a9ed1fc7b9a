from .validation import (  # noqa: F401
    json_validator_udf,
    validate_dataframe,
    validate_json_column,
    violation_rows,
)
