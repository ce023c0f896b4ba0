from . import contamination, dedup, similarity, skew, text  # noqa: F401

__all__ = ["text", "similarity", "dedup", "contamination", "skew"]
