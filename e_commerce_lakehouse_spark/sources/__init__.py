from .readers import read_csv, read_excel, read_with_fallback

__all__ = ["read_csv", "read_excel", "read_with_fallback"]
