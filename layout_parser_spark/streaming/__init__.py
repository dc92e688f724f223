from .extract_stream import extract_stream, windowed_block_stats  # noqa: F401
