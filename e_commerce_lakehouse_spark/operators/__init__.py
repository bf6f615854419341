from .analyze import analyze, read_stats
from .cluster import cluster
from .compact import compact
from .expire import expire_snapshots
from .manifest_rewrite import rewrite_manifests
from .merge import merge_into, merge_upsert_dataframes
from .rollback import rollback_to
from .schema_evolution import add_columns, drop_columns

__all__ = [
    "add_columns",
    "analyze",
    "read_stats",
    "drop_columns",
    "compact",
    "cluster",
    "rewrite_manifests",
    "expire_snapshots",
    "merge_into",
    "merge_upsert_dataframes",
    "rollback_to",
]
