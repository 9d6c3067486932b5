from .events_stream import (
    events_stream,
    hopping_stream,
    run_to_memory,
    sessionize_stream,
    tumbling_stream,
)
from .dedup_stream import dedup_stream, dedup_stream_from, docs_stream
from .stateful import running_user_totals, running_user_totals_ttl, totals_ttl_from

__all__ = [
    "events_stream",
    "hopping_stream",
    "tumbling_stream",
    "sessionize_stream",
    "run_to_memory",
    "running_user_totals",
    "running_user_totals_ttl",
    "totals_ttl_from",
    "dedup_stream",
    "dedup_stream_from",
    "docs_stream",
]
