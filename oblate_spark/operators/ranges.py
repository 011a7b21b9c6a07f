"""Range (interval-containment) join: match point rows to interval
rows with ``start <= t <= end`` — without letting Spark fall into the
BroadcastNestedLoopJoin a naive non-equi join plans (quadratic, and a
broadcast besides; OSS Spark has no range-join optimization — that is a
Databricks-runtime hint).

Spark-first shape (grain bucketing, the standard distributed range-join
strategy): quantize time into ``grain_seconds`` buckets; each interval
explodes to the grains it covers (map-side, fan-out = interval length /
grain), each point computes its single grain; equi-join on
(keys..., grain); the exact ``start <= t <= end`` filter runs after the
join. A (point, interval) pair can meet in exactly ONE grain — the
point's — so the join emits no duplicates and needs no distinct.

Scale: one shuffle on (keys, grain). Pick ``grain_seconds`` near the
typical interval length: the explode fan-out stays O(1) per interval
while each grain cell holds only co-temporal rows. Skew follows the
time distribution; a hot hour is a hot grain — add a key (tenant, user)
to the join to shard it. All arithmetic is exact integer microseconds
(``unix_micros``), so a SQL oracle reproduces the boundary decisions
bit-for-bit.

The reference library has no join surface (SURVEY.md §2.7); this is a
north-rule extension alongside asof_join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_time: str,
    start_col: str,
    end_col: str,
    grain_seconds: int,
    keys: Sequence[str] = (),
    point_cols: Sequence[str] | None = None,
    interval_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inner-join every point row to every interval row containing it
    (inclusive on both bounds), optionally also matching on equality
    ``keys`` present in both frames.

    Returns ``point_cols`` (default: all point columns) +
    ``interval_cols`` (default: all interval columns not already taken
    by the point side / keys). Times may be timestamps or anything
    castable to one; comparisons run on ``unix_micros`` BIGINTs.

    Intervals with ``end < start`` match nothing (dropped by the
    pre-explode filter, same as SQL BETWEEN). ``grain_seconds`` only
    affects performance, never results.
    """
    if grain_seconds <= 0:
        raise ValueError("grain_seconds must be positive")
    keys = list(keys)
    point_cols = list(points.columns) if point_cols is None else list(point_cols)
    if interval_cols is None:
        taken = set(point_cols) | set(keys)
        interval_cols = [c for c in intervals.columns if c not in taken]
    else:
        interval_cols = list(interval_cols)

    g_us = int(grain_seconds) * 1_000_000
    p_us = F.unix_micros(F.col(point_time).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    p = points.select(
        *[F.col(c) for c in point_cols],
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        p_us.alias("__t_us"),
        F.floor(p_us / F.lit(g_us)).alias("__grain"),
    )
    iv = (
        intervals.where(s_us <= e_us)
        .select(
            *[F.col(c) for c in interval_cols],
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            s_us.alias("__s_us"),
            e_us.alias("__e_us"),
        )
        .withColumn(
            "__grain",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s_us") / F.lit(g_us)),
                    F.floor(F.col("__e_us") / F.lit(g_us)),
                )
            ),
        )
    )
    join_on = ["__grain"] + [f"__k_{k}" for k in keys]
    extra_keys = [k for k in keys if k not in point_cols]
    out = (
        p.join(iv, on=join_on)
        .where(
            (F.col("__t_us") >= F.col("__s_us"))
            & (F.col("__t_us") <= F.col("__e_us"))
        )
        .select(
            *point_cols,
            *[F.col(f"__k_{k}").alias(k) for k in extra_keys],
            *interval_cols,
        )
    )
    return out
