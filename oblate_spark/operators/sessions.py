"""Event sessionization (gap-based) — window-function operator.

Standard gap-based sessionization expressed with lag + a cumulative sum
of session-start flags, partitioned by user. Single shuffle on user_id
(skew-safe: per-user event counts are bounded in real workloads; a
pathological hot user is split by AQE). The same expression works under
Structured Streaming with ``session_window`` for the unbounded case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize", "session_stats", "funnel_counts"]


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


def funnel_counts(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list,
) -> DataFrame:
    """Ordered funnel: how many users reached stage i IN ORDER — a user
    counts for stage 2 only with a stage-2 event strictly after their
    first qualifying stage-1 event. Output: (stage_idx, stage, n_users).
    Unordered per-stage counts overstate conversion (a purchase before
    the first view is not a converted funnel) — the order constraint is
    the point.

    Stage 1 is one combinable groupBy (first event per user); each later
    stage joins that stage's filtered events (predicate pushed to the
    scan) to the surviving users and keeps events after the user's
    previous-stage timestamp — shuffle joins on the user key, survivors
    shrink monotonically, AQE broadcasts the survivor side once it
    fits. The per-stage counts are single-row aggregates unioned into
    one frame; nothing global is sorted or collected."""
    if not stages:
        raise ValueError("stages must be non-empty")
    user, ts, typ = F.col(user_col), F.col(ts_col), F.col(type_col)
    cur = (
        df.filter(typ == stages[0])
        .groupBy(user.alias("__u"))
        .agg(F.min(ts).alias("__t"))
    )
    out = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(1).cast("int").alias("stage_idx"),
        F.lit(stages[0]).alias("stage"),
        F.col("n_users").cast("bigint"),
    )
    for i, stage in enumerate(stages[1:], start=2):
        nxt = (
            df.filter(typ == stage)
            .select(user.alias("__u"), ts.alias("__ts"))
            .join(cur, "__u")
            .filter(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        out = out.unionByName(
            nxt.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col("n_users").cast("bigint"),
            )
        )
        cur = nxt
    return out
