"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PYFILES_SENT: set = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make the mdq_spark package importable on Python workers even when
    the driver process runs outside the repo (the driver adds the repo
    to ITS sys.path, but forked workers don't inherit that).  Ships the
    package as a py-file once per SparkContext."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    key = id(spark.sparkContext)
    if key in _PYFILES_SENT:
        return
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "mdq_spark.zip")
    pkg = os.path.join(repo, "mdq_spark")
    src_mtime = max(os.path.getmtime(os.path.join(pkg, f))
                    for f in os.listdir(pkg) if f.endswith(".py"))
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < src_mtime:
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for f in sorted(os.listdir(pkg)):
                if f.endswith(".py"):
                    z.write(os.path.join(pkg, f), f"mdq_spark/{f}")
    spark.sparkContext.addPyFile(zpath)
    _PYFILES_SENT.add(key)


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
        # zstd on the wire: the inversion shuffle is the build's
        # dominant IO and zstd beats lz4 ~1.4x on its row stream at
        # negligible CPU (measured in scripts/measure_shuffle.py)
        .config("spark.io.compression.codec", "zstd")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
