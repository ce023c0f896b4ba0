from . import dedup, similarity, text  # noqa: F401

__all__ = ["text", "similarity", "dedup"]
