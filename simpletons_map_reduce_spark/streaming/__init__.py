from .events_stream import events_stream, tumbling_stream, sessionize_stream, run_to_memory

__all__ = ["events_stream", "tumbling_stream", "sessionize_stream", "run_to_memory"]
