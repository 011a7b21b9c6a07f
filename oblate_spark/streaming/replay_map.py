"""Partition-level grouped map for the batch replay operators.

``groupBy(key).applyInPandas`` ships ONE Arrow batch per group and pays
a Python call + two pandas-frame constructions per key — measured
~3.7 ms/group on the sessionization replay (5.5 s for 1500 users at
sf0.1 while the batch twin runs in 0.5 s). The replays only need
"all rows of a key in one place, keys processed independently", which
``repartition(key) + sortWithinPartitions(key, ...)`` provides with one
Arrow batch per ~10k rows instead of per key.

``grouped_map_sorted`` streams a partition's Arrow batches, carrying the
(possibly split) last key of each batch into the next, so memory stays
O(batch + one key's rows) — the same per-key bound as applyInPandas —
while the per-key Python work runs over numpy slices.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

__all__ = ["grouped_map_sorted", "_group_starts"]


def _group_starts(keys) -> list:
    """Boundary indices [0, ..., len] of key-contiguous runs in a sorted
    pandas Series, NULL-safe (all-NaN rows form ONE group, exactly like
    ``groupBy``'s null key)."""
    import numpy as np
    import pandas as pd

    prev = keys.shift()
    new_grp = (keys != prev) & ~(keys.isna() & prev.isna())
    flags = new_grp.to_numpy(copy=True)
    if len(flags):
        flags[0] = True
    idx = list(np.flatnonzero(flags))
    idx.append(len(keys))
    return idx


def grouped_map_sorted(
    df: DataFrame,
    *,
    key_col: str,
    sort_cols: list,
    fn_groups: Callable,
    out_schema,
) -> DataFrame:
    """Hash-distribute ``df`` by ``key_col`` (the same grouping guarantee
    as ``groupBy(key_col)``), sort each partition by ``[key_col] +
    sort_cols``, and run ``fn_groups(pdf)`` over maximal key-contiguous
    chunks: every key's rows appear in exactly one ``pdf``, sorted by
    ``sort_cols``. ``fn_groups`` returns a pandas DataFrame matching
    ``out_schema``.

    NULL keys group together (pandas ``isna``-safe carry)."""
    import pandas as pd

    shuffled = df.repartition(key_col).sortWithinPartitions(key_col, *sort_cols)

    def run(iterator):
        carry = None
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            keys = pdf[key_col]
            last = keys.iloc[-1]
            if pd.isna(last):
                mask = keys.isna()
            else:
                mask = keys == last
            # rows of the final key may continue in the next batch —
            # hold them back; emit the complete keys now
            carry = pdf[mask.to_numpy()]
            body = pdf[~mask.to_numpy()]
            if len(body):
                yield fn_groups(body)
        if carry is not None and len(carry):
            yield fn_groups(carry)

    return shuffled.mapInPandas(run, out_schema)
