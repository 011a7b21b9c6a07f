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
  driver with the compensated mergeable-summaries rule (Agarwal et al.).
  Shuffle-free: only partitions x capacity counter rows move.
  Guarantees, preserved across merges: for reported values
  true_count <= est <= true_count + err (err returned per row), and a
  value absent from the result has true count <= the merged summary's
  minimum estimate. The classic sketch choice when the token/value
  space doesn't fit an exact groupBy.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .partitioning import ensure_fanout_parallelism

__all__ = ["token_frequencies", "top_k_tokens", "approx_heavy_hitters"]


def token_frequencies(df: DataFrame, *, text_col: str) -> DataFrame:
    """(token, cnt) over whitespace tokens of ``text_col`` (normalized
    like operators.text: lower + trim, empty tokens dropped)."""
    from .text import tokens_expr

    df = ensure_fanout_parallelism(df)  # single-file inputs -> parallel explode
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

    def floor(self) -> int:
        """Upper bound on the true count of any value ABSENT from this
        summary: the minimum counter once the summary has filled (a
        value seen more often than the min would have evicted it), zero
        while every seen value still fits."""
        if len(self.counts) >= self.capacity:
            return min(self.counts.values())
        return 0

    def merge(self, other: "_SpaceSaving") -> None:
        """Sound compensated summary merge (Agarwal et al., "Mergeable
        Summaries": space-saving == Misra-Gries under the est = lower +
        err isomorphism). A value present in only one summary gets the
        OTHER summary's floor added — its count there may be anything up
        to that floor — so the invariants

            est - err <= true_count <= est

        hold for every reported value after any merge tree, and a value
        absent from the merged summary has true count <= merged floor().
        Truncation back to capacity keeps the largest estimates; dropped
        values are <= the kept minimum, so floor() stays a valid absent
        bound."""
        m_self, m_other = self.floor(), other.floor()
        counts: dict = {}
        errors: dict = {}
        for v in set(self.counts) | set(other.counts):
            counts[v] = self.counts.get(v, m_self) + other.counts.get(v, m_other)
            errors[v] = self.errors.get(v, m_self) + other.errors.get(v, m_other)
        if len(counts) > self.capacity:
            keep = sorted(counts, key=counts.get, reverse=True)[: self.capacity]
            counts = {v: counts[v] for v in keep}
            errors = {v: errors[v] for v in keep}
        self.counts, self.errors = counts, errors


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
    capacity counters — WHOLE summaries at a time (keyed by partition
    id), never counter rows one by one, so the compensated-merge bounds
    stay tight. Guarantees, preserved across the merge tree: for every
    reported value ``est - max_error <= true_count <= est``; a value
    absent from the result has true count <= the summary's minimum
    estimate (<= sum(est)/capacity)."""
    import pandas as pd

    cap = capacity

    def partial(iterator):
        from pyspark import TaskContext

        ss = _SpaceSaving(cap)
        for pdf in iterator:
            for v, c in pdf[col].value_counts(dropna=True).items():
                ss.add(v, int(c))
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "pid": [pid] * len(ss.counts),
                "value": list(ss.counts),
                "cnt": [ss.counts[v] for v in ss.counts],
                "err": [ss.errors[v] for v in ss.counts],
            }
        )

    rows = (
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(partial, "pid int, value string, cnt bigint, err bigint")
        .collect()
    )
    by_pid: dict[int, _SpaceSaving] = {}
    for r in rows:
        ss = by_pid.setdefault(int(r["pid"]), _SpaceSaving(cap))
        ss.counts[r["value"]] = int(r["cnt"])
        ss.errors[r["value"]] = int(r["err"])
    merged = _SpaceSaving(cap)
    for ss in by_pid.values():
        merged.merge(ss)
    out = [
        (v, merged.counts[v], merged.errors[v])
        for v in sorted(merged.counts, key=merged.counts.get, reverse=True)
    ]
    return out[:top] if top else out
