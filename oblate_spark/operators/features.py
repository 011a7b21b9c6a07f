"""Rolling event-window features (range-frame window aggregates).

The standard feature-engineering primitive over an event stream: for
every event, aggregates of the same key's events inside a trailing time
window (count / sum / max over the last hour, day, ...). Implemented as
Spark range-frame window functions — one shuffle on the key, no
self-join, no Python — the shape that survives 100 TB: state per key is
the in-flight frame, not the history.

Cross-engine exactness: the frame is defined on integer microseconds
(``unix_micros``), counts are exact BIGINTs, and sums run over
integer-ized values (``floor(value * 100)`` cents — the double multiply
and floor are IEEE-identical in every engine, and BIGINT addition is
associative, so even a different accumulation order cannot diverge).
A double-sum window would NOT be oracle-exact: FP addition is
order-dependent and engines order frames differently.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rolling_event_features"]


def rolling_event_features(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    window_seconds: int,
) -> DataFrame:
    """Per event row: (keys..., event columns..., t_us, w_count, w_sum_cents,
    w_max_cents) over the trailing ``window_seconds`` (inclusive of the
    current row; events with equal timestamps are frame peers — included
    together, the set-based RANGE semantics every SQL engine shares).

    One shuffle (window partitionBy on ``key_cols``); all outputs exact
    integers. Null timestamps are dropped (no frame to belong to); null
    values count toward ``w_count`` but contribute nothing to sum/max.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    base = df.filter(F.col(time_col).isNotNull()).select(
        *df.columns, t_us.alias("t_us"), cents.alias("__cents")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("t_us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return base.select(
        *df.columns,
        F.col("t_us"),
        F.count(F.lit(1)).over(w).alias("w_count"),
        F.coalesce(F.sum("__cents").over(w), F.lit(0)).alias("w_sum_cents"),
        F.max("__cents").over(w).alias("w_max_cents"),
    )
