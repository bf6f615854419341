from .meta import DataFileEntry, Snapshot, Table
from .scan import incremental_scan, planned_entries, prune_entries, scan
from .stats import collect_entries

__all__ = [
    "DataFileEntry",
    "Snapshot",
    "Table",
    "scan",
    "incremental_scan",
    "planned_entries",
    "prune_entries",
    "collect_entries",
]
