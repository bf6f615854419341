from .ingest import ingest_available_now, windowed_counts

__all__ = ["ingest_available_now", "windowed_counts"]
