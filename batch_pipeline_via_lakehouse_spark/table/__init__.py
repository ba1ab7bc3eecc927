from .catalog import Table
from .format import DataFile, Snapshot

__all__ = ["Table", "DataFile", "Snapshot"]
