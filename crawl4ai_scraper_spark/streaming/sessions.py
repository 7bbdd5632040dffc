"""Custom stateful streaming operator: per-host fetch sessionization via
``applyInPandasWithState`` (the arbitrary-stateful-processing API).

A "session" here is a burst of fetches from one host with no gap larger than
``gap_seconds`` between consecutive ``warc_ts`` events — the unit a crawl
monitor alerts on (a host being hammered in one burst). Windows + watermarks
can't express gap-based sessions; this is exactly the applyInPandasWithState
use case: per-key (host) state holds the open session, event-time timeout
flushes it when the watermark passes the gap.

Emitted rows: one per CLOSED session
    (host, session_start, session_end, fetches, bytes)

Batch-equivalent oracle: the ``sessionize_events`` contract query uses the
same gap semantics over a static table (lag/cumsum), which is how the
streaming operator's output is validated in tests.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, "
    "fetches long, bytes long"
)
# state: (session_start_ms, session_end_ms, fetches, bytes)
STATE_SCHEMA = "start long, end long, fetches long, bytes long"


def _sessionizer(gap_seconds: float):
    gap_ms = int(gap_seconds * 1000)

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]
        closed = []

        if state.hasTimedOut:
            # watermark passed the open session's gap → flush it
            start, end, fetches, nbytes = state.get
            closed.append((host, start, end, fetches, nbytes))
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, nb in zip(pdf["warc_ts"], pdf["nbytes"]):
                    rows.append((int(ts.value // 10**6), int(nb)))  # ms epoch
            rows.sort()
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for ts_ms, nb in rows:
                if cur is None:
                    cur = [ts_ms, ts_ms, 0, 0]
                elif ts_ms - cur[1] > gap_ms:
                    closed.append((host, cur[0], cur[1], cur[2], cur[3]))
                    cur = [ts_ms, ts_ms, 0, 0]
                cur[1] = max(cur[1], ts_ms)
                cur[2] += 1
                cur[3] += nb
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] + gap_ms)

        if closed:
            out = pd.DataFrame(
                closed, columns=["host", "start", "end", "fetches", "bytes"]
            )
            yield pd.DataFrame({
                "host": out["host"],
                "session_start": pd.to_datetime(out["start"], unit="ms"),
                "session_end": pd.to_datetime(out["end"], unit="ms"),
                "fetches": out["fetches"],
                "bytes": out["bytes"],
            })

    return fn


def host_sessions_stream(
    pages_stream: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "1 day",
) -> DataFrame:
    """pages stream → closed per-host fetch sessions (gap-based)."""
    hosts = pages_stream.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col("warc_ts"),
        F.length(F.col("html")).cast("long").alias("nbytes"),
    ).withWatermark("warc_ts", watermark)
    return hosts.groupBy("host").applyInPandasWithState(
        _sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
