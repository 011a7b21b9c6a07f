"""Partitioning helpers shared by the fan-out operators.

Document tables at test scale are often ONE parquet file (one input
split), so an explode-heavy operator (shingles, simhash, token
frequencies) would run its entire fan-out in a single task — measured
as zero core-scaling at sf0.1. These operators pre-repartition cheap
input rows before the expensive fan-out, but only when the scan is
actually narrow: at 100 TB the input is thousands of splits and an
unconditional repartition would be a pointless full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_fanout_parallelism"]


def ensure_fanout_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when it
    is a narrow file scan (fewer input files than cores).

    The probe is ``df.inputFiles()`` — plan metadata only, so no RDD
    lineage is materialized (``df.rdd.getNumPartitions()`` builds the
    whole RDD conversion just to read a count). A frame that is not a
    plain scan reports no input files; those frames sit downstream of a
    shuffle or local relation and already carry the session parallelism,
    so they are left untouched.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-scan plans on some versions raise instead
        return df
    if 0 < n_files < par:
        return df.repartition(par)
    return df
