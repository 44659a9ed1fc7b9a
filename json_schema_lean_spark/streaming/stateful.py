"""Custom stateful streaming operator: incremental gap-sessionization via
``applyInPandasWithState`` (the Spark-native pattern for stateful logic the
built-in windowed aggregations can't express; task-mandated extension).

Correctness under out-of-order arrival: micro-batches give NO cross-batch
event-time ordering, so a naive left fold undercounts sessions. Instead the
per-key state buffers *pending* event times; on each batch, events at or
below the current watermark are finalized (folded into committed counts and
dropped from state — the watermark guarantees nothing older arrives), while
the still-reorderable tail stays buffered. Emitted rows are committed counts
plus a provisional fold over the buffered tail, so downstream sees exact
totals once the key's data is complete. State size is bounded by the
watermark horizon (events per key per horizon).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_key long, n_sessions long, n_events long"
STATE_SCHEMA = "pending array<double>, last_ts double, n_sessions long, n_events long"


def _session_fold(ts_sorted: Iterable[float], last_ts, n_sessions: int,
                  n_events: int, gap_seconds: float):
    for t in ts_sorted:
        if last_ts is None or (t - last_ts) > gap_seconds:
            n_sessions += 1
        last_ts = t if last_ts is None else max(t, last_ts)
        n_events += 1
    return last_ts, n_sessions, n_events


def _fold_sessions(key: Tuple[Any, ...], batches: Iterable[pd.DataFrame],
                   state: GroupState, gap_seconds: float) -> Iterator[pd.DataFrame]:
    if state.exists:
        pending, last_ts, n_sessions, n_events = state.get
        pending = list(pending or [])
    else:
        pending, last_ts, n_sessions, n_events = [], None, 0, 0

    for pdf in batches:
        secs = pd.to_datetime(pdf["ts"]).astype("int64") / 1e9
        pending.extend(float(t) for t in secs)
    pending.sort()

    wm = state.getCurrentWatermarkMs() / 1000.0
    finalized = [t for t in pending if t <= wm]
    keep = [t for t in pending if t > wm]
    last_ts, n_sessions, n_events = _session_fold(
        finalized, last_ts, n_sessions, n_events, gap_seconds)
    state.update((keep, last_ts, n_sessions, n_events))

    # provisional totals include the buffered (not-yet-final) tail
    _, ns_out, ne_out = _session_fold(keep, last_ts, n_sessions, n_events,
                                      gap_seconds)
    yield pd.DataFrame({"user_key": [key[0]], "n_sessions": [ns_out],
                        "n_events": [ne_out]})


def streaming_session_counts(stream_df: DataFrame, key: str, ts: str,
                             gap_minutes: int = 30,
                             watermark: str = "1 hour") -> DataFrame:
    """Streaming per-key session/event counts with a `gap_minutes` session
    gap. Emits updated (committed + provisional) totals per key each
    micro-batch (update mode). The watermark bounds both late-data tolerance
    and per-key state size."""
    gap_seconds = gap_minutes * 60.0

    def fn(key, pdfs, state):
        return _fold_sessions(key, pdfs, state, gap_seconds)

    # watermarks need TIMESTAMP (not NTZ; parquet often reads as NTZ)
    narrowed = stream_df.selectExpr(f"{key} AS user_key",
                                    f"CAST({ts} AS TIMESTAMP) AS ts") \
                        .withWatermark("ts", watermark)
    return narrowed.groupBy("user_key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
