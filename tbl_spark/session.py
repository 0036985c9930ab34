"""SparkSession factory with scale-appropriate defaults.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
on a real cluster the same settings apply per-executor. AQE is on so skewed
shuffle partitions are split at runtime (backup for our explicit salting).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | str | None = None,
              shuffle_partitions: int | None = None,
              app_name: str = "tbl_spark") -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(32, 4 * n)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.local.dir", "/tmp/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
