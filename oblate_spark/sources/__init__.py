from .tableio import SnapshotTable, SnapshotInfo  # noqa: F401
