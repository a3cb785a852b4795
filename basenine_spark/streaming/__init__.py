"""Structured Streaming layer: the reference's live-follow QUERY mode
(T1/T2/T3, M1) re-expressed as a micro-batch tail over the durable
document log, plus the online twins of the batch pipeline operators —
watermark- or constant-bounded state throughout."""

from .anomaly import anomaly_stream  # noqa: F401
from .asof import attribution_join_stream  # noqa: F401
from .dedup import dedup_stream  # noqa: F401
from .funnel import funnel_stream  # noqa: F401
from .quality_monitor import quality_monitor_stream  # noqa: F401
from .semdedup import semantic_admit_stream  # noqa: F401
from .sessions import session_stream  # noqa: F401
from .source_cap import source_cap_admit_stream  # noqa: F401
from .tail import TailQuery, tail  # noqa: F401
from .windows import windowed_counts_stream  # noqa: F401
