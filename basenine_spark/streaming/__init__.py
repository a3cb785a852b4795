"""Structured Streaming layer: the reference's live-follow QUERY mode
(T1/T2/T3, M1) re-expressed as a micro-batch tail over the durable
document log."""

from .dedup import dedup_stream  # noqa: F401
from .semdedup import semantic_admit_stream  # noqa: F401
from .tail import TailQuery, tail  # noqa: F401
