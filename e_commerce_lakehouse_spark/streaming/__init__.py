from .ingest import (
    ingest_append_stream,
    ingest_available_now,
    stream_dedup,
    txn_last_epoch,
    windowed_counts,
)

__all__ = [
    "ingest_append_stream",
    "ingest_available_now",
    "stream_dedup",
    "txn_last_epoch",
    "windowed_counts",
]
