"""Event sessionization (gap-based) — window-function operator.

Standard gap-based sessionization expressed with lag + a cumulative sum
of session-start flags, partitioned by user. Single shuffle on user_id
(skew-safe: per-user event counts are bounded in real workloads; a
pathological hot user is split by AQE). The same expression works under
Structured Streaming with ``session_window`` for the unbounded case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session id to every event: a new session starts when the
    gap since the user's previous event exceeds ``gap_minutes``.
    Output: input columns + ``session_id`` (user-scoped ordinal)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # TIMESTAMP_NTZ doesn't cast to BIGINT directly; go via TIMESTAMP
    as_epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    gap_sec = as_epoch(F.col(ts_col)) - as_epoch(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id", F.sum(new_session).over(w).cast("bigint")
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session statistics: (user, n_sessions, n_events,
    max_session_events)."""
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap_minutes=gap_minutes)
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("events")
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("events").cast("bigint").alias("n_events"),
        F.max("events").cast("bigint").alias("max_session_events"),
    )
