"""Bucketed-table helpers: co-located joins without shuffle.

For recurring joins on the same key (e.g. repeated referential checks of
``lineitem.l_orderkey`` against ``orders.o_orderkey``, or image shards
joined to caption metadata by ``image_id``), writing both sides bucketed
by the join key lets every subsequent sort-merge join skip its Exchange
entirely — at 100 TB the difference between an hourly check re-shuffling
the fact table and one that reads co-located buckets.

Spark requires ``saveAsTable`` for bucketed writes (bucket metadata
lives in the catalog); the local in-memory catalog works, a Hive/Glue
metastore works identically on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    key: str,
    buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table keyed
    for future co-located joins on ``key``."""
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with equal
    bucket counts Catalyst plans a sort-merge join with NO Exchange on
    either side (verify in .explain: no 'Exchange' above the scans)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key)
