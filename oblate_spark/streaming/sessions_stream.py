"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin is ``operators.sessions.session_stats`` (window + running
sum); a stream cannot window-lag over unbounded input, so this keeps ONE
tiny state row per user (session start, last event, count) and

* closes a session when a new event arrives more than ``gap`` after the
  last one (``closed_by='gap'``), or
* closes the open session when the event-time watermark passes
  last + gap (``closed_by='timeout'``) — so idle users emit without
  needing another event.

State is O(active users), not O(events): the operator never buffers
events, only the 3-number summary, so it holds at any scale the shuffle
can hash-partition the user keys. Skewed users are irrelevant — state
size is constant per key regardless of event count.

Disorder guarantee (eager-emit design): results equal the batch twin
for in-order streams and for out-of-order arrival as long as a
session's events do not straddle an emitting batch boundary (see
fold_sessions + the property test). An event arriving AFTER its
session was already emitted is output as an additional session —
append mode cannot retract — so counts are at-least-once under
unbounded disorder. Exact-under-watermark semantics require buffering
open intervals until the watermark passes (Spark's built-in
session_window does this, at the cost of emission latency); this
operator trades that for immediate gap-triggered emission.

The reference library has no streaming surface; this is the Axis-B
generalization of per-row validation state to unbounded input
(SURVEY.md §2.7 UDF/UDAF + streaming rows).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "sessionize_stream",
    "fold_sessions",
    "replay_sessions_batched",
    "SESSION_OUTPUT_SCHEMA",
]


def fold_sessions(state, ts, gap):
    """Fold sorted event times into the open-session state; returns
    (closed_sessions, new_state), both as (start, last, cnt) tuples
    (new_state None when no events and no state).

    Batch-twin semantics over (state interval + sorted new events):
    maintain time-ordered intervals whose internal gaps are <= gap (the
    state interval holds that invariant by construction); each event
    merges into an existing interval when within ``gap`` of it, possibly
    BRIDGING two intervals into one — so a chain of cross-batch late
    events forms one earlier session, and a chain that reaches
    back-to-within-gap of the open session extends it, exactly as the
    batch operator would. Intervals are separated by > gap by
    construction, so every interval but the newest is a closed session;
    the newest stays open.

    Module-level (not a closure) so the microbatch-split == one-batch
    equivalence is property-testable without a streaming query."""
    intervals: list = []  # [start, last, cnt], time-ordered
    if state is not None:
        intervals.append(list(state))
    for t in ts:
        placed = False
        for iv in intervals:
            if iv[0] - gap <= t <= iv[1] + gap:
                iv[0] = min(iv[0], t)
                iv[1] = max(iv[1], t)
                iv[2] += 1
                placed = True
                break
        if not placed:
            intervals.append([t, t, 1])
        intervals.sort(key=lambda iv: iv[0])
        merged: list = []
        for iv in intervals:  # bridge intervals now within gap
            if merged and iv[0] - merged[-1][1] <= gap:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)
        intervals = merged
    closed = [tuple(iv) for iv in intervals[:-1]]
    new_state = tuple(intervals[-1]) if intervals else None
    return closed, new_state

SESSION_OUTPUT_SCHEMA = (
    "user_id string, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed_by string"
)
_STATE_SCHEMA = "start double, last double, cnt bigint"


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """(streaming) -> closed sessions (user_id, session_start,
    session_end, n_events, closed_by). Append-mode sink compatible."""
    import pandas as pd

    gap = float(gap_minutes) * 60.0

    ev = (
        events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .select(F.col(user_col).cast("string").alias("user_id"), "__ts")
    )

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state: Any) -> Iterator["pd.DataFrame"]:
        uid = key[0]

        def rows(closed_list, reason):
            return pd.DataFrame(
                {
                    "user_id": [uid] * len(closed_list),
                    "session_start": pd.to_datetime([c[0] for c in closed_list], unit="s"),
                    "session_end": pd.to_datetime([c[1] for c in closed_list], unit="s"),
                    "n_events": pd.array([c[2] for c in closed_list], dtype="Int64"),
                    "closed_by": [reason] * len(closed_list),
                }
            )

        if state.hasTimedOut:
            start, last, cnt = state.get
            state.remove()
            yield rows([(start, last, cnt)], "timeout")
            return

        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(pdf["__ts"].astype("int64").to_numpy() / 1e9)
        ts.sort()

        if state.exists:
            start, last, cnt = state.get
        else:
            start = last = None
            cnt = 0

        closed, new_state = fold_sessions(
            (start, last, cnt) if last is not None else None, ts, gap
        )
        if new_state is not None:
            start, last, cnt = new_state
        else:
            start = last = None
            cnt = 0

        if last is not None:
            state.update((float(start), float(last), int(cnt)))
            # event-time timeout: fires when the watermark passes it.
            # Events later than `gap` but still inside the watermark can
            # leave last + gap AT or BELOW the current watermark, and
            # setTimeoutTimestamp raises on a non-future timestamp
            # (INVALID_TIMEOUT_TIMESTAMP would fail the whole query) —
            # clamp to watermark + 1ms so the session closes on the next
            # microbatch instead of crashing the stream.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int((last + gap) * 1000), wm_ms + 1))
        if closed:
            yield rows(closed, "gap")

    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def replay_sessions_batched(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    n_batches: int = 4,
) -> DataFrame:
    """Replay a BATCH event table through the streaming fold as
    ``n_batches`` time-ordered microbatches — the operator's disorder
    contract (stream == batch for ordered microbatch splits), runnable
    without a streaming query so the equivalence the property tests pin
    is also oracle-visible.

    Events are split into ``n_batches`` equal event-time spans (the
    shape of time-ordered microbatches); per user, ``fold_sessions`` —
    the exact per-key kernel ``sessionize_stream`` runs — is applied to
    each batch slice in order, carrying the open-session state across
    batch boundaries; the final open session is flushed
    (``closed_by='flush'``, the watermark-timeout analogue). Output:
    (user_id <source key dtype>, session_start double, session_end
    double, n_events bigint, closed_by string) — epoch seconds,
    aggregate-ready. The key column keeps the INPUT column's type (a
    bigint user_id stays bigint) so replay output aggregates compare
    hash-identical with the batch twin — the streaming operator's
    string-keyed state layout is an internal detail, not part of the
    output contract.

    Distribution: one shuffle on user_id (identical to the streaming
    operator's state partitioning); per-group memory is the user's
    events, the same as any windowed sessionization group."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    gap = float(gap_minutes) * 60.0
    sec = F.col(ts_col).cast("timestamp").cast("double")
    bounds = events.select(
        F.min(sec).alias("mn"), F.max(sec).alias("mx")
    ).collect()[0]  # bounded collect: two scalars
    mn, mx = bounds["mn"], bounds["mx"]
    out_schema = StructType(
        [
            StructField("user_id", events.schema[user_col].dataType),
            StructField("session_start", DoubleType()),
            StructField("session_end", DoubleType()),
            StructField("n_events", LongType()),
            StructField("closed_by", StringType()),
        ]
    )
    ev = events.select(F.col(user_col).alias("user_id"), sec.alias("sec"))
    if mn is None:
        return ev.sparkSession.createDataFrame([], out_schema)
    span = max(float(mx) - float(mn), 1e-9)
    ev = ev.withColumn(
        "batch",
        F.least(
            F.lit(n_batches - 1),
            F.floor((F.col("sec") - F.lit(float(mn))) / F.lit(span) * n_batches),
        ).cast("int"),
    )

    from .replay_map import _group_starts, grouped_map_sorted

    def fn_groups(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # rows arrive sorted by (user_id, sec) with every user complete
        # in this chunk; batch is monotone in sec, so per-batch slices
        # stay time-ordered exactly as the old per-group sort produced
        users = pdf["user_id"].to_numpy()
        secs = pdf["sec"].to_numpy()
        batches = pdf["batch"].to_numpy()
        out_uid: list = []
        out: list = []
        start_idx = _group_starts(pdf["user_id"])
        for g in range(len(start_idx) - 1):
            i0, i1 = start_idx[g], start_idx[g + 1]
            state = None
            rows: list = []
            gsec, gbatch = secs[i0:i1], batches[i0:i1]
            for b in range(n_batches):
                ts = gsec[gbatch == b].tolist()
                closed, state = fold_sessions(state, ts, gap)
                rows.extend((s, e, c, "gap") for s, e, c in closed)
            if state is not None:
                rows.append((*state, "flush"))
            out_uid.extend([users[i0]] * len(rows))
            out.extend(rows)
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_uid, dtype=pdf["user_id"].dtype),
                "session_start": [o[0] for o in out],
                "session_end": [o[1] for o in out],
                "n_events": pd.array([o[2] for o in out], dtype="Int64"),
                "closed_by": [o[3] for o in out],
            }
        )

    return grouped_map_sorted(
        ev,
        key_col="user_id",
        sort_cols=["sec"],
        fn_groups=fn_groups,
        out_schema=out_schema,
    )
