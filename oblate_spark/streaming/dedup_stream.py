"""Streaming exact deduplication: emit the FIRST occurrence of every
key, drop the rest — the streaming form of ``dedup.exact_duplicates``'s
"keep canonical" decision, as a custom stateful operator.

State is one row per key: the chosen first occurrence. With
``retention_minutes`` set, an event-time timeout expires a key's state
once the watermark passes ``first_ts + retention`` — bounding state to
the keys seen within the retention horizon (the semantics of Spark's
``dropDuplicatesWithinWatermark``: a key re-appearing AFTER the horizon
is treated as new and re-emitted). Without retention the contract is
global first-occurrence — state O(distinct keys), the same cost
``dropDuplicates`` pays — and the result is exactly SQL's
``row_number() OVER (PARTITION BY key ORDER BY ts, id) = 1``, which is
what the oracle checks.

The per-key kernel ``fold_first_seen`` is module-level so the
microbatch-split == one-batch equivalence is property-testable without
a streaming query, and ``replay_dedup_batched`` replays a batch table
through it in time-ordered slices with state carried across batch
boundaries — same harness shape as
``sessions_stream.replay_sessions_batched``. The replay output keeps
the INPUT key column's dtype (a bigint stays bigint): the streaming
operator's string-keyed state layout is an internal detail, not part
of the output contract.

Disorder guarantee: append mode cannot retract, so an event arriving
in a LATER microbatch with an EARLIER timestamp than the already-emitted
first occurrence is dropped (the emitted row stays canonical). For
time-ordered microbatch splits the result equals the batch twin
exactly; under unbounded disorder emission is first-ARRIVAL-wins among
batches, first-TIMESTAMP-wins within a batch.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "fold_first_seen",
    "dedup_stream",
    "replay_dedup_batched",
    "DEDUP_OUTPUT_SCHEMA",
]

DEDUP_OUTPUT_SCHEMA = "key string, event_id bigint, first_us bigint"
_STATE_SCHEMA = "first_us long, first_id long"


def fold_first_seen(state, rows, retention_us=None):
    """Fold one batch's (ts_us, event_id) rows into the first-seen
    state; returns (emitted, new_state) where emitted is a list of
    (ts_us, event_id) canonical rows and state is (first_us, first_id)
    or None.

    Within a batch the first occurrence is min (ts_us, event_id) —
    deterministic under ties. With ``retention_us``, a batch whose
    earliest row is more than retention past the stored first
    occurrence re-emits (the stored key expired); the streaming
    operator implements the same expiry via event-time timeout.
    """
    if not rows:
        return [], state
    first = min(rows)
    if state is None:
        return [first], first
    if retention_us is not None and first[0] > state[0] + retention_us:
        return [first], first
    return [], state


def dedup_stream(
    events: DataFrame,
    *,
    key_col: str,
    id_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    retention_minutes: int | None = None,
) -> DataFrame:
    """(streaming) -> first-occurrence rows (key, event_id, first_us).
    Append-mode sink compatible; state one row per live key."""
    import pandas as pd

    retention_us = (
        None if retention_minutes is None else int(retention_minutes) * 60_000_000
    )

    ev = (
        events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark)
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("long").alias("event_id"),
            F.unix_micros(F.col("__ts")).alias("__us"),
            F.col("__ts"),
        )
    )

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        k = key[0]
        if state.hasTimedOut:
            state.remove()  # retention passed: key may re-emit later
            return

        rows: list = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["__us"].astype("int64"), pdf["event_id"].astype("int64"))
            )
        st = tuple(state.get) if state.exists else None
        emitted, new_state = fold_first_seen(
            st, [(int(u), int(i)) for u, i in rows], retention_us
        )
        if new_state is not None and new_state != st:
            state.update((int(new_state[0]), int(new_state[1])))
            if retention_us is not None:
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max((new_state[0] + retention_us) // 1000, wm_ms + 1)
                )
        if emitted:
            yield pd.DataFrame(
                {
                    "key": [k] * len(emitted),
                    "event_id": pd.array([e[1] for e in emitted], dtype="Int64"),
                    "first_us": pd.array([e[0] for e in emitted], dtype="Int64"),
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if retention_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def replay_dedup_batched(
    events: DataFrame,
    *,
    key_col: str,
    id_col: str,
    ts_col: str = "ts",
    n_batches: int = 4,
    retention_minutes: int | None = None,
) -> DataFrame:
    """Replay a BATCH table through ``fold_first_seen`` as ``n_batches``
    time-ordered microbatch slices with state carried across boundaries.
    Without retention the output is split-invariant and equals SQL's
    first-row-per-key — the oracle contract. Output: (key <input
    dtype>, event_id bigint, first_us bigint).

    Distribution: one shuffle on the key (the streaming operator's
    state partitioning); per-group memory is the key's events."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    retention_us = (
        None if retention_minutes is None else int(retention_minutes) * 60_000_000
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out_schema = StructType(
        [
            StructField("key", events.schema[key_col].dataType),
            StructField("event_id", LongType()),
            StructField("first_us", LongType()),
        ]
    )
    ev = events.select(
        F.col(key_col).alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        us.alias("us"),
    )
    bounds = ev.select(F.min("us").alias("mn"), F.max("us").alias("mx")).collect()[
        0
    ]  # bounded collect: two scalars
    mn, mx = bounds["mn"], bounds["mx"]
    if mn is None:
        return ev.sparkSession.createDataFrame([], out_schema)
    span = max(float(mx) - float(mn), 1.0)
    ev = ev.withColumn(
        "batch",
        F.least(
            F.lit(n_batches - 1),
            F.floor((F.col("us") - F.lit(int(mn))) / F.lit(span) * n_batches),
        ).cast("int"),
    )

    from .replay_map import _group_starts, grouped_map_sorted

    def fn_groups(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # rows sorted by (key, us); each key complete in this chunk
        keys_np = pdf["key"].to_numpy()
        us_np = pdf["us"].to_numpy()
        ids_np = pdf["event_id"].to_numpy()
        batch_np = pdf["batch"].to_numpy()
        out_key: list = []
        out: list = []
        starts = _group_starts(pdf["key"])
        for g in range(len(starts) - 1):
            i0, i1 = starts[g], starts[g + 1]
            state = None
            gus, gid, gb = us_np[i0:i1], ids_np[i0:i1], batch_np[i0:i1]
            for b in sorted(set(gb.tolist())):
                sel = gb == b
                rows = [
                    (int(u), int(i)) for u, i in zip(gus[sel], gid[sel])
                ]
                emitted, state = fold_first_seen(state, rows, retention_us)
                out.extend(emitted)
                out_key.extend([keys_np[i0]] * len(emitted))
        return pd.DataFrame(
            {
                "key": pd.Series(out_key, dtype=pdf["key"].dtype),
                "event_id": [e[1] for e in out],
                "first_us": [e[0] for e in out],
            }
        )

    return grouped_map_sorted(
        ev,
        key_col="key",
        sort_cols=["us", "event_id"],
        fn_groups=fn_groups,
        out_schema=out_schema,
    )
