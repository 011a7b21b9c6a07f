"""Term/value frequency analysis: exact top-k and an approximate
heavy-hitters sketch (space-saving) for unbounded-cardinality columns.

Training-data pipelines use this for vocabulary statistics, hot-value
detection (skew diagnosis before a join), and category-mix monitoring.

Scale notes:

* ``top_k_tokens`` — explode + ONE combinable groupBy + top-k planned as
  TakeOrderedAndProject (per-partition top-k, no global sort). Exact —
  correct at any scale, but the shuffle carries every distinct token.
* ``approx_heavy_hitters`` — Metwally et al.'s space-saving summary per
  partition (constant memory: ``capacity`` counters), merged on the
  driver. Shuffle-free: only partitions x capacity counter rows move.
  Guarantees: every value with true count > N/capacity is present, and
  for reported values true_count <= est <= true_count + err (err
  returned per row). The classic sketch choice when the token/value
  space doesn't fit an exact groupBy.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["token_frequencies", "top_k_tokens", "approx_heavy_hitters"]


def token_frequencies(df: DataFrame, *, text_col: str) -> DataFrame:
    """(token, cnt) over whitespace tokens of ``text_col`` (normalized
    like operators.text: lower + trim, empty tokens dropped)."""
    from .text import tokens_expr

    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)  # single-file inputs -> parallel explode
    toks = df.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


def top_k_tokens(df: DataFrame, *, text_col: str, k: int = 20) -> DataFrame:
    """Exact top-k tokens by count, ties broken by token ascending
    (deterministic across engines). Planned as TakeOrderedAndProject —
    per-partition top-k then a k-row driver merge, never a global sort."""
    counts = token_frequencies(df, text_col=text_col)
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(k)


class _SpaceSaving:
    """Classic space-saving summary: ``capacity`` counters; an unseen
    value evicts the minimum counter, inheriting its count as the error
    bound."""

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity
        self.counts: dict = {}
        self.errors: dict = {}

    def add(self, value, inc: int = 1) -> None:
        c = self.counts
        if value in c:
            c[value] += inc
            return
        if len(c) < self.capacity:
            c[value] = inc
            self.errors[value] = 0
            return
        victim = min(c, key=c.get)
        floor = c.pop(victim)
        self.errors.pop(victim)
        c[value] = floor + inc
        self.errors[value] = floor

    def merge(self, other: "_SpaceSaving") -> None:
        """Standard summary merge: sum counts (max error adds), then
        truncate back to capacity keeping the largest estimates."""
        for v, cnt in other.counts.items():
            if v in self.counts:
                self.counts[v] += cnt
                self.errors[v] += other.errors[v]
            else:
                self.counts[v] = cnt
                self.errors[v] = other.errors[v]
        if len(self.counts) > self.capacity:
            keep = sorted(self.counts, key=self.counts.get, reverse=True)[: self.capacity]
            dropped_max = max(
                self.counts[v] for v in self.counts if v not in set(keep)
            )
            self.counts = {v: self.counts[v] for v in keep}
            self.errors = {
                v: max(self.errors.get(v, 0), dropped_max) for v in keep
            }


def approx_heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    capacity: int = 1024,
    top: Optional[int] = None,
) -> list[tuple]:
    """Driver-side list of (value, est_count, max_error), est descending.

    Per-partition space-saving partials stream through ``mapInPandas``
    (constant executor memory), the driver merges <= partitions x
    capacity counters. ``est - max_error`` is a guaranteed lower bound
    on the true count; any value with true count > total/capacity is
    guaranteed present."""
    import pandas as pd

    cap = capacity

    def partial(iterator):
        ss = _SpaceSaving(cap)
        for pdf in iterator:
            for v, c in pdf[col].value_counts(dropna=True).items():
                ss.add(v, int(c))
        yield pd.DataFrame(
            {
                "value": list(ss.counts),
                "cnt": [ss.counts[v] for v in ss.counts],
                "err": [ss.errors[v] for v in ss.counts],
            }
        )

    rows = (
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(partial, "value string, cnt bigint, err bigint")
        .collect()
    )
    merged = _SpaceSaving(cap)
    for r in rows:
        one = _SpaceSaving(cap)
        one.counts[r["value"]] = int(r["cnt"])
        one.errors[r["value"]] = int(r["err"])
        merged.merge(one)
    out = [
        (v, merged.counts[v], merged.errors[v])
        for v in sorted(merged.counts, key=merged.counts.get, reverse=True)
    ]
    return out[:top] if top else out
