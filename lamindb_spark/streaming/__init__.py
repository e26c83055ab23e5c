from .events import (  # noqa: F401
    read_event_stream,
    windowed_counts,
    session_windows,
    stream_dedup,
)
from .dedup import stream_admit_neardup  # noqa: F401
