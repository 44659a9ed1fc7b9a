from .tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
from .spansgen import asset_catalog, spans_documents  # noqa: F401
