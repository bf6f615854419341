from .cdc import ChangeFeedConsumer, ChangeFeedError, IncrementalConsumer
from .inspect import (
    files_df,
    partitions_df,
    register_metadata_views,
    snapshots_df,
)
from .meta import CommitConflictError, DataFileEntry, Snapshot, Table
from .partition import PartitionField
from .scan import (
    incremental_scan,
    planned_entries,
    prune_entries,
    read_with_tombstones,
    scan,
    scan_semi_join,
    tombstone_classes,
)
from .stats import collect_entries

__all__ = [
    "ChangeFeedConsumer",
    "ChangeFeedError",
    "CommitConflictError",
    "DataFileEntry",
    "PartitionField",
    "IncrementalConsumer",
    "Snapshot",
    "Table",
    "scan",
    "scan_semi_join",
    "incremental_scan",
    "planned_entries",
    "prune_entries",
    "read_with_tombstones",
    "tombstone_classes",
    "collect_entries",
    "files_df",
    "snapshots_df",
    "partitions_df",
    "register_metadata_views",
]
