from .meta import DataFileEntry, Snapshot, Table
from .scan import prune_entries, scan
from .stats import collect_entries

__all__ = ["DataFileEntry", "Snapshot", "Table", "scan", "prune_entries", "collect_entries"]
