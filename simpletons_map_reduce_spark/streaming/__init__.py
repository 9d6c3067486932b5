from .events_stream import events_stream, tumbling_stream, sessionize_stream, run_to_memory
from .stateful import running_user_totals

__all__ = [
    "events_stream",
    "tumbling_stream",
    "sessionize_stream",
    "run_to_memory",
    "running_user_totals",
]
