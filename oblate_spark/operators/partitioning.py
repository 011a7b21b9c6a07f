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


def _bytes_conf(spark, key: str, default: int) -> int:
    """A size conf as bytes (Spark reports '134217728b' / '128MB'
    style strings depending on how it was set)."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def ensure_fanout_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    file scan will produce fewer partitions than cores.

    The probe mirrors Spark's own file-packing arithmetic
    (``FilePartition.maxSplitBytes``): with total = Σ(len + openCost),
    ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    total / defaultParallelism))`` and the scan yields roughly
    ``ceil(total / maxSplitBytes)`` partitions. Dividing by
    maxPartitionBytes alone (the old probe) under-estimates: a single
    200 MB splittable file already scans ~core-wide via the
    bytesPerCore term, and repartitioning it again would be a redundant
    full shuffle. A raw file COUNT is wrong both ways: many tiny files
    pack into few partitions (fan-out still serialized), and few huge
    splittable files already scan wide.

    File sizes come from ONE ``listStatus`` per distinct parent
    directory (a many-file table would otherwise pay O(n_files)
    sequential driver RPCs on every fan-out call); stragglers the
    listing misses fall back to per-file ``getFileStatus``. Frames that
    are not plain scans report no input files; those sit downstream of
    a shuffle or local relation and already carry the session
    parallelism, so they are left untouched.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-scan plans on some versions raise instead
        return df
    if not files:
        return df
    max_part = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        by_parent: dict = {}
        for f in files:
            parent, _, name = f.rpartition("/")
            by_parent.setdefault(parent, {})[name] = f
        total = 0
        for parent, want in by_parent.items():
            jparent = jvm.org.apache.hadoop.fs.Path(parent)
            fs = jparent.getFileSystem(hconf)
            for st in fs.listStatus(jparent):
                name = st.getPath().getName()
                if name in want:
                    total += int(st.getLen())
                    del want[name]
            for leftover in want.values():  # listing raced a rename etc.
                jpath = jvm.org.apache.hadoop.fs.Path(leftover)
                total += int(
                    jpath.getFileSystem(hconf).getFileStatus(jpath).getLen()
                )
    except Exception:
        # sizes unavailable: fall back to the conservative count probe
        return df.repartition(par) if len(files) < par else df
    padded = total + len(files) * open_cost
    bytes_per_core = padded // max(par, 1)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    est_partitions = -(-padded // max(max_split, 1))
    if est_partitions < par:
        return df.repartition(par)
    return df
