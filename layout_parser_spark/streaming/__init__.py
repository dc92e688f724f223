from .extract_stream import extract_stream, windowed_block_stats  # noqa: F401
from .stateful import host_session_stats  # noqa: F401
