from .validate_stream import validate_stream, violation_counts_windowed, valid_invalid_split  # noqa: F401
