"""Custom stateful streaming operator: live event-transition extraction via
``applyInPandasWithState``.

The batch twin is ``operators.funnel.event_transitions`` (lead() in a
user-partitioned window); lead() has no streaming form — the transition
between the last event of micro-batch N and the first event of micro-batch
N+1 crosses the batch boundary, which is exactly what per-key state is for.
Per user the state is ONE row (the last seen event's ts/id/type); each batch
sorts its per-user slice by (ts, event_id) — the same deterministic order as
the batch operator — emits one (from_type, to_type) row per consecutive
pair including the carried boundary pair, and stores the new tail.

Emitted rows feed any downstream count (a streaming groupBy or a batch
rollup of the sink); the pytest proves a multi-drain run reproduces the
batch transition matrix exactly, including transitions that straddle the
drain boundary.

Caveat shared with every stream-ordering design: state advances in arrival
order per micro-batch — a row arriving LATER than an already-processed
higher-ts row would emit against the stored tail rather than re-sorting
history (bounded state means no replay). Feed it a source in per-user
event-time order (the ingest layer's sorted shards) or accept
arrival-order semantics, as all incremental transition pipelines do.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = "user_id long, from_type string, to_type string"
# state: tail of the user's event sequence
STATE_SCHEMA = "last_ts long, last_id long, last_type string"


def _transitioner():
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user = key[0]
        rows = []
        for pdf in pdfs:
            for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                rows.append((int(ts.value // 10**6), int(eid), str(etype)))
        rows.sort()
        if not rows:
            return
        out = []
        prev = state.get if state.exists else None
        for ts_ms, eid, etype in rows:
            if prev is not None:
                out.append((user, prev[2], etype))
            prev = (ts_ms, eid, etype)
        state.update(prev)
        if out:
            yield pd.DataFrame(out, columns=["user_id", "from_type", "to_type"])

    return fn


def transitions_stream(events_stream: DataFrame) -> DataFrame:
    """events stream (event_id, user_id, event_type, ts) → one row per
    consecutive same-user event pair, micro-batch boundaries bridged by
    per-user single-row state. No timeout: a user's chain stays open for
    the life of the query (state is O(users), constant per user)."""
    ev = events_stream.select("user_id", "event_id", "event_type", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        _transitioner(),
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
