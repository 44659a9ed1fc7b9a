from .fused import FusedUnsupported, validate_documents_fused  # noqa: F401
