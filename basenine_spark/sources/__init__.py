"""Sources: parquet scans + streaming ingest (SURVEY.md §2.1)."""

from .tables import DEFAULT_SF_DIR, TABLES, load_all, load_table, register_views

__all__ = ["load_table", "load_all", "register_views", "TABLES", "DEFAULT_SF_DIR"]
