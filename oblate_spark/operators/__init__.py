from . import dedup, drift, similarity, stats, text  # noqa: F401

__all__ = ["stats", "drift", "dedup", "similarity", "text"]
