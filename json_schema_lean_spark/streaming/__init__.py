from .validate_stream import validated_stream, validation_window_metrics  # noqa: F401
