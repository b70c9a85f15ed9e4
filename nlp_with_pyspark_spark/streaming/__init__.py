from .stateful import user_running_stats
from .windows import (
    events_stream_from_dir,
    sessionized_stream,
    streaming_dedup,
    tumbling_stream,
)

__all__ = [
    "events_stream_from_dir",
    "sessionized_stream",
    "streaming_dedup",
    "tumbling_stream",
    "user_running_stats",
]
