from .validation import (  # noqa: F401
    json_validator_udf,
    validate_dataframe,
    validate_json_column,
    violation_rows,
)
from .packing import (  # noqa: F401
    batch_summary,
    deterministic_sample,
    pack_documents,
    stratified_sample,
)
