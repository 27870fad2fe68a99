"""SparkSession factory tuned for the frontier engine.

Local-mode defaults mirror what a multi-executor submit would set via
spark-submit conf: AQE on (runtime coalesce + skew-join splitting),
Arrow enabled for every pandas UDF exchange, shuffle partitions sized
to the core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str = "*",
    app_name: str = "crawler_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is the local[N] parallelism; shuffle partitions default
    to the core count (local mode has no network shuffle — more
    partitions than cores only adds scheduling overhead, fewer starves
    the executors).

    ``master`` overrides the local[N] master string — the executor-
    scaling benchmark passes ``local-cluster[N,C,M]``, the multi-JVM
    single-machine analogue of a real cluster (separate executor
    processes, netty shuffle, per-executor python worker pools); in a
    real deployment this is where spark-submit's --master lands.
    """
    if shuffle_partitions is None:
        ncpu = os.cpu_count() or 8
        shuffle_partitions = ncpu if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NB: keep the heap modest. A 48g dynamically-grown G1 heap
        # measured 2M rows/s at local[32] vs 158M rows/s with 8g on the
        # same query (page-fault/GC thrash while the heap inflates under
        # 32 allocating threads). The engine streams its payload to
        # parquet rather than caching it, so a big heap buys nothing.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # pin explicitly (it IS the Spark default, but the per-epoch
        # fixed-cost decomposition in bench.py depends on it): python
        # workers persist across tasks, so the Arrow UDF stages pay
        # interpreter+import startup once per executor core, not once
        # per task — with reuse off, each epoch's fetch/bloom stages
        # would re-fork ~32 pythons and the "fixed per-epoch cost"
        # measured by --scaling would be inflated by respawn time
        .config("spark.python.worker.reuse", "true")
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
