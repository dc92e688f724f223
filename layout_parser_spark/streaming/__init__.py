from .extract_stream import (  # noqa: F401
    dedup_stream,
    extract_stream,
    windowed_block_stats,
)
from .stateful import host_session_stats  # noqa: F401
