"""SparkSession builders tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: AQE on
(runtime re-planning + skew-join splitting), shuffle partitions sized to
the core count rather than the 200 default, Arrow enabled for every
pandas-UDF exchange. On a real cluster the same builder is used by
``spark-submit --py-files``; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    cores: int | None = None,
    app_name: str = "oblate_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default 32). Shuffle
    partitions default to ``max(cores, 8)`` — sized so each of the
    local executor threads gets work without creating thousands of
    tiny reducers; at cluster scale callers override this to
    ~2-3x total cores.
    """
    # keep per-worker numpy/BLAS single-threaded: N python workers each
    # spawning a BLAS pool oversubscribes the box (inherited by workers)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Plan-hygiene default measured in round 6 (OPTIMIZATION_r06.md):
        # InferFiltersFromGenerate copies the ENTIRE generator expression
        # into a pre-Generate filter, so every compiled violations array
        # was evaluated twice per row (the filter is pushed through the
        # projection by alias substitution, which is cost-unaware, and
        # Generate already drops empty arrays). Excluding it cut staged
        # lineitem validation 10.97s -> 5.81s at sf0.1; the cost on
        # prune-friendly jobs (image report explode) measured ~1s the
        # other way — net strongly positive, and scale-independent
        # (pure per-row compute, no shuffle involvement).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("OBLATE_SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        # JVM tuning for the Arrow-exchange allocation pattern of
        # binary-heavy mapInPandas, measured on local[8..32]:
        # - ParallelGC: default G1 stalls erratically (humongous batch
        #   buffers + all cores busy -> concurrent-cycle thrash)
        # - Xms=Xmx + AlwaysPreTouch: without it the heap grows lazily
        #   and young GCs absorb multi-second page-zeroing stalls
        #   (observed 3-4.3 s young pauses on a virtualized host)
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC "
            f"-Xms{os.environ.get('OBLATE_SPARK_DRIVER_MEM', '12g')} -XX:+AlwaysPreTouch",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
