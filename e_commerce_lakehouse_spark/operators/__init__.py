from .cluster import cluster
from .compact import compact
from .expire import expire_snapshots
from .manifest_rewrite import rewrite_manifests
from .merge import merge_into, merge_upsert_dataframes

__all__ = [
    "compact",
    "cluster",
    "rewrite_manifests",
    "expire_snapshots",
    "merge_into",
    "merge_upsert_dataframes",
]
