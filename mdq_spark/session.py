"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "mdq_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Session tuned for the engine.

    * AQE on (runtime coalescing + skew-join splitting);
    * Arrow enabled (every Python kernel is Arrow-batched);
    * shuffle partitions sized to parallelism (overridable per bench run);
    * 128MB file split target so huge parquet scans parallelize.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or None
    master = f"local[{cores}]" if cores else "local[*]"
    sp = shuffle_partitions or (cores * 2 if cores else 32)
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
