"""Snapshot diff / change-data-capture between two table versions.

The Iceberg-style validation workflow this engine targets (BASELINE
north rule: resumable snapshot validation over an image+caption table)
needs one more primitive the reference library has no analogue for:
given two versions of a keyed table, produce the exact change set —
which keys appeared, vanished, or changed, and WHICH columns changed.
That change set is what incremental re-validation consumes (only
validate inserts+updates), what audit trails record, and what a
snapshot-expiry safety check diffs before dropping history.

Pure DataFrame composition: one full-outer shuffle join on the key
columns (sort-merge at scale; AQE handles key skew), null-safe
column comparison via ``eqNullSafe`` so NULL→value, value→NULL and
NULL→NULL transitions are classified correctly, and a map-side
projection building the changed-column list. No UDFs, no collects.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact change set from ``base`` to ``new`` keyed by ``key_cols``.

    Output: key columns + (change_type string, changed_cols string,
    n_changed int) with one row per inserted / deleted / changed key —
    unchanged keys are dropped. ``change_type`` is ``'insert'`` (key
    only in ``new``), ``'delete'`` (only in ``base``) or ``'update'``
    (present in both, at least one compared column differs under
    null-safe equality). ``changed_cols`` is the comma-joined sorted
    list of differing columns ('' for insert/delete), ``n_changed``
    its size.

    ``compare_cols`` defaults to all non-key columns present in BOTH
    frames (sorted). Keys are assumed unique per frame — this is a
    keyed-table diff, not a bag diff.

    Distribution: ONE full-outer join on the keys — sort-merge at
    scale, both sides shuffle-partitioned on the same key so the
    compare is co-located; AQE splits skewed keys. Everything after
    the join is a codegen'd projection. Nothing is collected; output
    size is bounded by the true change volume, so downstream
    incremental validation touches only changed data.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        base_cols = set(base.columns) - set(keys)
        compare_cols = sorted(base_cols & (set(new.columns) - set(keys)))
    comp = list(compare_cols)

    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in comp],
        F.lit(True).alias("__in_base"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in comp],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__bk_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = b.join(n, cond, "full_outer")

    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__b_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in comp
            ]
        )
    ) if comp else F.array().cast("array<string>")
    in_base = F.coalesce(F.col("__in_base"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    change_type = (
        F.when(in_base & ~in_new, F.lit("delete"))
        .when(~in_base & in_new, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"__bk_{k}"), F.col(f"__nk_{k}")).alias(k)
        for k in keys
    ]
    res = joined.select(
        *out_keys,
        change_type.alias("change_type"),
        F.when(
            change_type == "update",
            F.array_join(F.array_sort(changed), ","),
        )
        .otherwise(F.lit(""))
        .alias("changed_cols"),
        F.when(change_type == "update", F.size(F.array_sort(changed)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_changed"),
    )
    return res.filter(
        (F.col("change_type") != "update") | (F.col("n_changed") > 0)
    )
