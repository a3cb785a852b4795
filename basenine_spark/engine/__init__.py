"""Engine layer: query modes + operational commands (SURVEY.md §2.10)."""

from .db import BasenineDB, Metadata, index_to_id

__all__ = ["BasenineDB", "Metadata", "index_to_id"]
