from .validate_stream import validate_stream, violation_counts_windowed, valid_invalid_split  # noqa: F401
from .sessions_stream import sessionize_stream, SESSION_OUTPUT_SCHEMA  # noqa: F401
from .drift_stream import windowed_bin_counts, psi_per_window  # noqa: F401
