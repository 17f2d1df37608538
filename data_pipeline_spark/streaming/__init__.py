from .windows import session_windows, sliding_counts, windowed_counts  # noqa: F401
from .stateful import stateful_lww_changes  # noqa: F401
from .joins import stream_stream_enrich  # noqa: F401
