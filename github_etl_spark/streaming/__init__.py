"""Streaming layer: micro-batch pipeline + event-time operators."""

from .events import (  # noqa: F401
    clicks_to_purchases_join,
    dedup_within_watermark,
    session_counts,
    tumbling_counts,
)
from .pipeline import run_batch, stream_github, stream_landing  # noqa: F401
from .stateful import running_totals  # noqa: F401
