"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-host running extraction statistics with timeout-based session close.

Demonstrates the engine's stateful slot (the reference has no streaming;
this is the shape a production crawl-monitoring op takes): for each host,
maintain (docs, text_bytes, last_seen) across micro-batches; emit a final
summary row when the host goes quiet for the timeout (or the stream
drains)."""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, docs long, text_bytes long, closed boolean"
STATE_SCHEMA = "docs long, text_bytes long"


def _update_host(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (host,) = key
    if state.hasTimedOut:
        docs, text_bytes = state.get
        state.remove()
        yield pd.DataFrame(
            [(host, docs, text_bytes, True)],
            columns=["host", "docs", "text_bytes", "closed"],
        )
        return
    docs, text_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        text_bytes += int(pdf["n_text_bytes"].sum())
    state.update((docs, text_bytes))
    state.setTimeoutDuration(30_000)
    yield pd.DataFrame(
        [(host, docs, text_bytes, False)],
        columns=["host", "docs", "text_bytes", "closed"],
    )


def host_session_stats(extracted: DataFrame) -> DataFrame:
    """extracted stream → per-host running (docs, text_bytes) with
    processing-time timeout close.  Input needs (url, extracted_text)."""
    hosts = extracted.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        F.length("extracted_text").cast("long").alias("n_text_bytes"),
    )
    return hosts.groupBy("host").applyInPandasWithState(
        _update_host,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
