from .table import CommitConflict, HyTable, Snapshot

__all__ = ["HyTable", "Snapshot", "CommitConflict"]
